"""Filtering criteria (predicates) applied after read modification."""

from abc import ABC, abstractmethod

from .qualtrim import expected_errors
from .info import ModificationInfo


class Predicate(ABC):
    @abstractmethod
    def test(self, read, info: ModificationInfo) -> bool:
        """Return True if the filtering criterion matches."""

    @classmethod
    def descriptive_identifier(cls) -> str:
        """Snake-case name used as identifier in the JSON report."""
        return "".join(
            ("_" + ch.lower() if ch.isupper() else ch) for ch in cls.__name__
        )[1:]


class TooShort(Predicate):
    """Select reads shorter than the given minimum length."""

    def __init__(self, minimum_length: int):
        self.minimum_length = minimum_length

    def __repr__(self):
        return f"TooShort(minimum_length={self.minimum_length})"

    def test(self, read, info: ModificationInfo):
        return len(read) < self.minimum_length


class TooLong(Predicate):
    """Select reads longer than the given maximum length."""

    def __init__(self, maximum_length: int):
        self.maximum_length = maximum_length

    def __repr__(self):
        return f"TooLong(maximum_length={self.maximum_length})"

    def test(self, read, info: ModificationInfo):
        return len(read) > self.maximum_length


class TooManyExpectedErrors(Predicate):
    """
    Select reads whose expected number of errors (from quality values)
    exceeds a threshold (cf. usearch's -fastq_maxee).
    """

    def __init__(self, max_errors: float):
        self.max_errors = max_errors

    def __repr__(self):
        return f"TooManyExpectedErrors(max_errors={self.max_errors})"

    def test(self, read, info: ModificationInfo):
        return expected_errors(read.qualities) > self.max_errors


class TooHighAverageErrorRate(Predicate):
    """
    Select reads whose average expected error rate is above the
    threshold (better suited to varying-length reads).
    """

    def __init__(self, max_error_rate: float):
        if not 0.0 < max_error_rate < 1.0:
            raise ValueError(
                f"max_error_rate must be between 0.0 and 1.0, got {max_error_rate}."
            )
        self.max_error_rate = max_error_rate

    def __repr__(self):
        return f"TooHighAverageErrorRate(max_error_rate={self.max_error_rate}"

    def test(self, read, info: ModificationInfo):
        read_length = len(read)
        if read_length == 0:
            return False
        return (expected_errors(read.qualities) / read_length) > self.max_error_rate


class TooManyN(Predicate):
    """
    Select reads with too many N bases, by count (cutoff >= 1) or by
    fraction of the read length (cutoff < 1).
    """

    def __init__(self, count: float):
        assert count >= 0
        self.is_proportion = count < 1.0
        self.cutoff = count

    def __repr__(self):
        return f"TooManyN(cutoff={self.cutoff}, is_proportion={self.is_proportion})"

    def test(self, read, info: ModificationInfo):
        n_count = read.sequence.lower().count("n")
        if self.is_proportion:
            if len(read) == 0:
                return False
            return n_count / len(read) > self.cutoff
        else:
            return n_count > self.cutoff


class CasavaFiltered(Predicate):
    """
    Select reads that failed the CASAVA filter (header ``xxxx x:Y:x:x``).
    """

    def __repr__(self):
        return "CasavaFiltered()"

    def test(self, read, info: ModificationInfo):
        _, _, right = read.name.partition(" ")
        return right[1:4] == ":Y:"


class IsUntrimmed(Predicate):
    """Select reads with no adapter match."""

    def __repr__(self):
        return "DiscardUntrimmed()"

    def test(self, read, info: ModificationInfo):
        return not info.matches

    @classmethod
    def descriptive_identifier(cls) -> str:
        return "discard_untrimmed"


class IsTrimmed(Predicate):
    """Select reads with at least one adapter match."""

    def __repr__(self):
        return "DiscardTrimmed()"

    def test(self, read, info: ModificationInfo):
        return bool(info.matches)

    @classmethod
    def descriptive_identifier(cls) -> str:
        return "discard_trimmed"
