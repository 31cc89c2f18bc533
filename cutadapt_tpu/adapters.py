"""
Adapter model: the ten adapter types, match objects, multi-adapter
matching and the anchored-adapter index.

Adapter classes are thin *configurations* over the alignment kernel:
each type picks a set of EndSkip flags, an optional coordinate
transform (e.g. the rightmost variants align the reversed sequences and
mirror the result), and the match class that determines what gets
trimmed. Capability-equivalent to the reference's adapter layer
(/root/reference/src/cutadapt/adapters.py).
"""

import logging
import time
from abc import ABC, abstractmethod
from collections import defaultdict
from enum import IntFlag
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

from .align import (
    Aligner,
    EndSkip,
    PrefixComparer,
    SuffixComparer,
    edit_environment,
    hamming_sphere,
)
from .kmer_finder import KmerFinder, MockKmerFinder
from .kmer_heuristic import create_positions_and_kmers, kmer_probability_analysis

logger = logging.getLogger()


class InvalidCharacter(Exception):
    pass


class Where(IntFlag):
    """Aligner flag combinations for the adapter types.

    "REFERENCE" is the adapter sequence, "QUERY" is the read.
    """

    BACK = EndSkip.QUERY_START | EndSkip.QUERY_STOP | EndSkip.REFERENCE_END
    FRONT = EndSkip.QUERY_START | EndSkip.QUERY_STOP | EndSkip.REFERENCE_START
    PREFIX = EndSkip.QUERY_STOP
    SUFFIX = EndSkip.QUERY_START
    FRONT_NOT_INTERNAL = EndSkip.REFERENCE_START | EndSkip.QUERY_STOP
    BACK_NOT_INTERNAL = EndSkip.QUERY_START | EndSkip.REFERENCE_END
    ANYWHERE = EndSkip.SEMIGLOBAL


def returns_defaultdict_int():
    # module-level function so EndStatistics stays picklable
    return defaultdict(int)


def print_matrices(aligner):  # pragma: no cover - debugging aid
    print("Edit distances:")
    print(aligner.dpmatrix)
    print("Scores:")
    print(aligner.scorematrix)


class EndStatistics:
    """Statistics about the 5' or 3' end of an adapter."""

    def __init__(self, adapter: "SingleAdapter"):
        self.max_error_rate: float = adapter.max_error_rate
        self.sequence: str = adapter.sequence
        self.effective_length: int = adapter.effective_length
        self.has_wildcards: bool = adapter.adapter_wildcards
        self.indels: bool = adapter.indels
        self.adapter_type: str = adapter.descriptive_identifier()
        self.allows_partial_matches: bool = adapter.allows_partial_matches
        # errors[length][e] == number of removals of this length at e errors
        self.errors: Dict[int, Dict[int, int]] = defaultdict(
            returns_defaultdict_int
        )
        self.adjacent_bases = {"A": 0, "C": 0, "G": 0, "T": 0, "": 0}
        self._remove_prefix = isinstance(adapter, FrontAdapter)

    def __repr__(self):
        errors = {k: dict(v) for k, v in self.errors.items()}
        return (
            "EndStatistics(max_error_rate={}, errors={}, "
            "adjacent_bases={})".format(
                self.max_error_rate, errors, self.adjacent_bases
            )
        )

    def __iadd__(self, other: Any):
        if not isinstance(other, self.__class__):
            raise ValueError("Cannot compare")
        if (
            self.max_error_rate != other.max_error_rate
            or self.sequence != other.sequence
            or self.effective_length != other.effective_length
            or self.indels != other.indels
        ):
            raise RuntimeError("Incompatible EndStatistics, cannot be added")
        for base in ("A", "C", "G", "T", ""):
            self.adjacent_bases[base] += other.adjacent_bases[base]
        for length, error_dict in other.errors.items():
            for errors in error_dict:
                self.errors[length][errors] += other.errors[length][errors]
        return self

    @property
    def lengths(self):
        return {
            length: sum(errors.values())
            for length, errors in self.errors.items()
        }

    def random_match_probabilities(self, gc_content: float) -> List[float]:
        """
        p[i] = probability that i bases of this adapter end match a
        random sequence with the given GC content (indels ignored).
        """
        assert 0.0 <= gc_content <= 1.0
        seq = self.sequence
        if self._remove_prefix:
            seq = seq[::-1]
        allowed_bases = "CGRYSKMBDHVN" if self.has_wildcards else "GC"
        p = 1.0
        probabilities = [p]
        for c in seq:
            if c in allowed_bases:
                p *= gc_content / 2.0
            else:
                p *= (1.0 - gc_content) / 2.0
            probabilities.append(p)
        return probabilities


class AdapterStatistics(ABC):
    reverse_complemented: int = 0
    name: str
    adapter: "Adapter"

    @abstractmethod
    def __iadd__(self, other):
        pass

    @abstractmethod
    def end_statistics(
        self,
    ) -> Tuple[Optional[EndStatistics], Optional[EndStatistics]]:
        pass

    @abstractmethod
    def add_match(self, match) -> None:
        pass


class SingleAdapterStatistics(AdapterStatistics, ABC):
    def __init__(self, adapter: "SingleAdapter"):
        self.name = adapter.name
        self.adapter = adapter
        self.end = EndStatistics(adapter)

    def __repr__(self):
        return f"SingleAdapterStatistics(name={self.name}, end={self.end})"

    def __iadd__(self, other: "SingleAdapterStatistics"):
        if not isinstance(other, self.__class__):
            raise ValueError("Cannot iadd")
        self.end += other.end
        self.reverse_complemented += other.reverse_complemented
        return self


class FrontAdapterStatistics(SingleAdapterStatistics):
    def add_match(self, match: "RemoveBeforeMatch"):
        self.end.errors[match.removed_sequence_length()][match.errors] += 1

    def end_statistics(self):
        return self.end, None


class BackAdapterStatistics(SingleAdapterStatistics):
    def add_match(self, match: "RemoveAfterMatch"):
        adjacent_base = match.adjacent_base()
        self.end.errors[match.removed_sequence_length()][match.errors] += 1
        try:
            self.end.adjacent_bases[adjacent_base] += 1
        except KeyError:
            self.end.adjacent_bases[""] += 1

    def end_statistics(self):
        return None, self.end


class LinkedAdapterStatistics(AdapterStatistics):
    def __init__(
        self,
        adapter: "LinkedAdapter",
        front: "SingleAdapter",
        back: "SingleAdapter",
    ):
        self.name = adapter.name
        self.adapter = adapter
        self.front = EndStatistics(front)
        self.back = EndStatistics(back)
        self.reverse_complemented = 0

    def __repr__(self):
        return (
            f"LinkedAdapterStatistics(name={self.name}, "
            f"front={self.front}, back={self.back})"
        )

    def __iadd__(self, other: "LinkedAdapterStatistics"):
        if not isinstance(other, self.__class__):
            raise ValueError("Cannot iadd")
        self.front += other.front
        self.back += other.back
        self.reverse_complemented += other.reverse_complemented
        return self

    def add_match(self, match: "LinkedMatch"):
        if match.front_match:
            self.front.errors[match.front_match.removed_sequence_length()][
                match.front_match.errors
            ] += 1
        if match.back_match:
            adjacent_base = match.back_match.adjacent_base()
            self.back.errors[match.back_match.removed_sequence_length()][
                match.back_match.errors
            ] += 1
            try:
                self.back.adjacent_bases[adjacent_base] += 1
            except KeyError:
                self.back.adjacent_bases[""] += 1

    def end_statistics(self):
        return self.front, self.back


class AnywhereAdapterStatistics(AdapterStatistics):
    def __init__(self, adapter: "AnywhereAdapter"):
        self.name = adapter.name
        self.adapter = adapter
        self.front = EndStatistics(adapter)
        self.back = EndStatistics(adapter)
        self.reverse_complemented = 0

    def __repr__(self):
        return (
            f"AnywhereAdapterStatistics(name={self.name}, "
            f"front={self.front}, back={self.back})"
        )

    def __iadd__(self, other: "AnywhereAdapterStatistics"):
        if not isinstance(other, AnywhereAdapterStatistics):
            raise ValueError("Cannot add")
        self.front += other.front
        self.back += other.back
        self.reverse_complemented += other.reverse_complemented
        return self

    def add_match(
        self, match: Union["RemoveBeforeMatch", "RemoveAfterMatch"]
    ) -> None:
        if isinstance(match, RemoveBeforeMatch):
            self.front.errors[match.removed_sequence_length()][match.errors] += 1
        else:
            adjacent_base = match.adjacent_base()
            self.back.errors[match.removed_sequence_length()][match.errors] += 1
            try:
                self.back.adjacent_bases[adjacent_base] += 1
            except KeyError:
                self.back.adjacent_bases[""] += 1

    def end_statistics(self):
        return self.front, self.back


class Match(ABC):
    adapter: "Adapter"

    @abstractmethod
    def remainder_interval(self) -> Tuple[int, int]:
        pass

    @abstractmethod
    def retained_adapter_interval(self) -> Tuple[int, int]:
        pass

    @abstractmethod
    def get_info_records(self, read) -> List[List]:
        pass

    @abstractmethod
    def trimmed(self, read):
        pass

    @abstractmethod
    def match_sequence(self):
        pass


class SingleMatch(Match, ABC):
    """A single adapter matched to a single read sequence."""

    __slots__ = [
        "astart",
        "astop",
        "rstart",
        "rstop",
        "score",
        "errors",
        "adapter",
        "sequence",
        "length",
    ]

    def __init__(
        self,
        astart: int,
        astop: int,
        rstart: int,
        rstop: int,
        score: int,
        errors: int,
        adapter: "SingleAdapter",
        sequence: str,
    ):
        self.astart = astart
        self.astop = astop
        self.rstart = rstart
        self.rstop = rstop
        self.score = score
        self.errors = errors
        self.adapter = adapter
        self.sequence = sequence
        # Number of aligned adapter characters (may differ from the
        # number of read characters when there are indels).
        self.length = astop - astart

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(astart={self.astart}, "
            f"astop={self.astop}, rstart={self.rstart}, rstop={self.rstop}, "
            f"score={self.score}, errors={self.errors})"
        )

    def __eq__(self, other) -> bool:
        return (
            other.__class__ is self.__class__
            and self.astart == other.astart
            and self.astop == other.astop
            and self.rstart == other.rstart
            and self.rstop == other.rstop
            and self.score == other.score
            and self.errors == other.errors
            and self.adapter is other.adapter
            and self.sequence == other.sequence
        )

    def wildcards(self, wildcard_char: str = "N") -> str:
        """The read characters that the adapter's wildcards matched."""
        wildcards = [
            self.sequence[self.rstart + i]
            for i in range(self.length)
            if self.adapter.sequence[self.astart + i] == wildcard_char
            and self.rstart + i < len(self.sequence)
        ]
        return "".join(wildcards)

    def get_info_records(self, read) -> List[List]:
        seq = read.sequence
        qualities = read.qualities
        info = [
            "",
            self.errors,
            self.rstart,
            self.rstop,
            seq[0 : self.rstart],
            seq[self.rstart : self.rstop],
            seq[self.rstop :],
            self.adapter.name,
        ]
        if qualities:
            info += [
                qualities[0 : self.rstart],
                qualities[self.rstart : self.rstop],
                qualities[self.rstop :],
            ]
        else:
            info += ["", "", ""]
        return [info]

    def match_sequence(self):
        return self.sequence[self.rstart : self.rstop]

    @abstractmethod
    def removed_sequence_length(self) -> int:
        pass


class RemoveBeforeMatch(SingleMatch):
    """A match that removes the sequence before (5' of) the match."""

    def rest(self) -> str:
        return self.sequence[: self.rstart]

    def remainder_interval(self) -> Tuple[int, int]:
        return self.rstop, len(self.sequence)

    def retained_adapter_interval(self) -> Tuple[int, int]:
        return self.rstart, len(self.sequence)

    def trim_slice(self):
        return slice(self.rstop, None)

    def trimmed(self, read):
        return read[self.rstop :]

    def removed_sequence_length(self) -> int:
        return self.rstop


class RemoveAfterMatch(SingleMatch):
    """A match that removes the sequence after (3' of) the match."""

    def rest(self) -> str:
        return self.sequence[self.rstop :]

    def remainder_interval(self) -> Tuple[int, int]:
        return 0, self.rstart

    def retained_adapter_interval(self) -> Tuple[int, int]:
        return 0, self.rstop

    def trim_slice(self):
        return slice(None, self.rstart)

    def trimmed(self, read):
        return read[: self.rstart]

    def adjacent_base(self) -> str:
        return self.sequence[self.rstart - 1 : self.rstart]

    def removed_sequence_length(self) -> int:
        return len(self.sequence) - self.rstart


def _generate_adapter_name(_start=[1]) -> str:
    name = str(_start[0])
    _start[0] += 1
    return name


class Matchable(ABC):
    """Something with a match_to() method."""

    def __init__(self, name: Optional[str], *args, **kwargs):
        self.name = name

    @abstractmethod
    def match_to(self, sequence: str):
        pass


class Adapter(Matchable, ABC):
    description = "adapter with one component"  # overridden in subclasses

    @abstractmethod
    def spec(self) -> str:
        """String representation of this adapter (spec mini-language)."""

    @abstractmethod
    def create_statistics(self) -> AdapterStatistics:
        pass

    @abstractmethod
    def descriptive_identifier(self) -> str:
        pass

    @abstractmethod
    def enable_debug(self) -> None:
        pass


class SingleAdapter(Adapter, ABC):
    """
    A single adapter characterized by its sequence, error rate and type.

    max_errors values >= 1 are interpreted as an absolute error count
    and converted to a rate over the non-N length of the sequence.
    """

    allows_partial_matches: bool = True

    def __init__(
        self,
        sequence: str,
        max_errors: float = 0.1,
        min_overlap: int = 3,
        read_wildcards: bool = False,
        adapter_wildcards: bool = True,
        name: Optional[str] = None,
        indels: bool = True,
    ):
        self.name: str = _generate_adapter_name() if name is None else name
        super().__init__(self.name)
        self._debug: bool = False
        self.sequence: str = (
            sequence.upper().replace("U", "T").replace("I", "N")
        )
        if not self.sequence:
            raise ValueError("Adapter sequence is empty")
        if max_errors >= 1 and self.sequence.count("N") != len(self.sequence):
            max_errors /= len(self.sequence) - self.sequence.count("N")
        self.max_error_rate: float = max_errors
        self.min_overlap: int = min(min_overlap, len(self.sequence))
        iupac = frozenset("ABCDGHKMNRSTUVWXY")
        if adapter_wildcards and not set(self.sequence) <= iupac:
            for c in self.sequence:
                if c not in iupac:
                    raise InvalidCharacter(
                        f"Character '{c}' in adapter sequence "
                        f"'{self.sequence}' is not a valid IUPAC code. "
                        "Use only characters 'ABCDGHIKMNRSTUVWXY'."
                    )
        # Use non-wildcard matching when only ACGT appears.
        self.adapter_wildcards: bool = adapter_wildcards and not set(
            self.sequence
        ) <= set("ACGT")
        self.read_wildcards: bool = read_wildcards
        self.indels: bool = indels
        self.aligner = self._aligner()
        self.kmer_finder = self._kmer_finder()

    def _make_aligner(self, sequence: str, flags: int) -> Aligner:
        # Indels are suppressed by giving them a very high cost.
        indel_cost = 1 if self.indels else 100000
        return Aligner(
            sequence,
            self.max_error_rate,
            flags=flags,
            wildcard_ref=self.adapter_wildcards,
            wildcard_query=self.read_wildcards,
            indel_cost=indel_cost,
            min_overlap=self.min_overlap,
        )

    def _make_kmer_finder(
        self,
        sequence: str,
        back_adapter: bool,
        front_adapter: bool,
        internal: bool = True,
    ) -> Union[KmerFinder, MockKmerFinder]:
        positions_and_kmers = create_positions_and_kmers(
            sequence,
            self.min_overlap,
            self.max_error_rate,
            back_adapter,
            front_adapter,
            internal,
        )
        if self._debug:
            print(kmer_probability_analysis(positions_and_kmers))
        try:
            return KmerFinder(
                positions_and_kmers, self.adapter_wildcards, self.read_wildcards
            )
        except ValueError:
            # Kmers too long for the shift-and word.
            return MockKmerFinder()

    def __repr__(self):
        return (
            "<{cls}(name={name!r}, sequence={sequence!r}, "
            "max_error_rate={max_error_rate}, min_overlap={min_overlap}, "
            "read_wildcards={read_wildcards}, "
            "adapter_wildcards={adapter_wildcards}, "
            "indels={indels})>".format(
                cls=self.__class__.__name__,
                name=self.name,
                sequence=self.sequence,
                max_error_rate=self.max_error_rate,
                min_overlap=self.min_overlap,
                read_wildcards=self.read_wildcards,
                adapter_wildcards=self.adapter_wildcards,
                indels=self.indels,
            )
        )

    @property
    def effective_length(self) -> int:
        return self.aligner.effective_length

    def enable_debug(self) -> None:
        self._debug = True
        self.aligner.enable_debug()

    @abstractmethod
    def _aligner(self):
        pass

    @abstractmethod
    def _kmer_finder(self):
        pass

    @abstractmethod
    def match_to(self, sequence: str):
        """Match this adapter against `sequence`; return Match or None."""

    def __len__(self) -> int:
        return len(self.sequence)


class FrontAdapter(SingleAdapter):
    """A 5' adapter."""

    description = "regular 5'"

    def __init__(self, *args, **kwargs):
        self._force_anywhere = kwargs.pop("force_anywhere", False)
        super().__init__(*args, **kwargs)

    def descriptive_identifier(self) -> str:
        return "regular_five_prime"

    def _aligner(self) -> Aligner:
        return self._make_aligner(
            self.sequence,
            Where.ANYWHERE.value if self._force_anywhere else Where.FRONT.value,
        )

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence, back_adapter=self._force_anywhere, front_adapter=True
        )

    def match_to(self, sequence: str):
        if not self.kmer_finder.kmers_present(sequence):
            return None
        alignment = self.aligner.locate(sequence)
        if self._debug:
            print_matrices(self.aligner)
        if alignment is None:
            return None
        return RemoveBeforeMatch(*alignment, adapter=self, sequence=sequence)

    def spec(self) -> str:
        return f"{self.sequence}..."

    def create_statistics(self) -> FrontAdapterStatistics:
        return FrontAdapterStatistics(self)


class RightmostFrontAdapter(FrontAdapter):
    """A 5' adapter that prefers rightmost matches.

    Implemented by aligning the reversed sequences with BACK-type flags
    and mirroring the coordinates back.
    """

    description = "rightmost 5'"

    def descriptive_identifier(self) -> str:
        return "rightmost_five_prime"

    def _aligner(self) -> Aligner:
        return self._make_aligner(
            self.sequence[::-1],
            Where.ANYWHERE.value if self._force_anywhere else Where.BACK.value,
        )

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence[::-1],
            back_adapter=True,
            front_adapter=self._force_anywhere,
        )

    def match_to(self, sequence: str):
        reversed_sequence = sequence[::-1]
        if not self.kmer_finder.kmers_present(reversed_sequence):
            return None
        alignment = self.aligner.locate(reversed_sequence)
        if self._debug:
            print_matrices(self.aligner)
        if alignment is None:
            return None
        ref_start, ref_end, query_start, query_end, score, errors = alignment
        mirrored = (
            len(self.sequence) - ref_end,
            len(self.sequence) - ref_start,
            len(sequence) - query_end,
            len(sequence) - query_start,
            score,
            errors,
        )
        return RemoveBeforeMatch(*mirrored, adapter=self, sequence=sequence)

    def spec(self) -> str:
        return f"{self.sequence}...;rightmost"


class BackAdapter(SingleAdapter):
    """A 3' adapter."""

    description = "regular 3'"

    def __init__(self, *args, **kwargs):
        self._force_anywhere = kwargs.pop("force_anywhere", False)
        super().__init__(*args, **kwargs)

    def descriptive_identifier(self) -> str:
        return "regular_three_prime"

    def _aligner(self):
        return self._make_aligner(
            self.sequence,
            Where.ANYWHERE.value if self._force_anywhere else Where.BACK.value,
        )

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence, back_adapter=True, front_adapter=self._force_anywhere
        )

    def match_to(self, sequence: str):
        if not self.kmer_finder.kmers_present(sequence):
            return None
        alignment = self.aligner.locate(sequence)
        if self._debug:
            print_matrices(self.aligner)  # pragma: no cover
        if alignment is None:
            return None
        return RemoveAfterMatch(*alignment, adapter=self, sequence=sequence)

    def spec(self) -> str:
        return f"{self.sequence}"

    def create_statistics(self) -> BackAdapterStatistics:
        return BackAdapterStatistics(self)


class RightmostBackAdapter(BackAdapter):
    """A 3' adapter that prefers rightmost matches."""

    description = "rightmost 3'"

    def descriptive_identifier(self) -> str:
        return "rightmost_three_prime"

    def _aligner(self) -> Aligner:
        return self._make_aligner(
            self.sequence[::-1],
            Where.ANYWHERE.value if self._force_anywhere else Where.FRONT.value,
        )

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence[::-1],
            back_adapter=self._force_anywhere,
            front_adapter=True,
        )

    def match_to(self, sequence: str):
        reversed_sequence = sequence[::-1]
        if not self.kmer_finder.kmers_present(reversed_sequence):
            return None
        alignment = self.aligner.locate(reversed_sequence)
        if self._debug:
            print_matrices(self.aligner)
        if alignment is None:
            return None
        ref_start, ref_end, query_start, query_end, score, errors = alignment
        mirrored = (
            len(self.sequence) - ref_end,
            len(self.sequence) - ref_start,
            len(sequence) - query_end,
            len(sequence) - query_start,
            score,
            errors,
        )
        return RemoveAfterMatch(*mirrored, adapter=self, sequence=sequence)

    def spec(self) -> str:
        return f"{self.sequence};rightmost"


class AnywhereAdapter(SingleAdapter):
    """
    An adapter that can be 5' or 3'. If the match starts at the first
    base of the read, it is treated as 5', otherwise as 3'.
    """

    description = "variable 5'/3'"

    def descriptive_identifier(self) -> str:
        return "anywhere"

    def _aligner(self):
        return self._make_aligner(self.sequence, Where.ANYWHERE.value)

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence, back_adapter=True, front_adapter=True
        )

    def match_to(self, sequence: str):
        if not self.kmer_finder.kmers_present(sequence):
            return None
        alignment = self.aligner.locate(sequence.upper())
        if self._debug:
            print_matrices(self.aligner)
        if alignment is None:
            return None
        # rstart == 0 means it is a 5' adapter
        if alignment[2] == 0:
            match = RemoveBeforeMatch(*alignment, adapter=self, sequence=sequence)
        else:
            match = RemoveAfterMatch(*alignment, adapter=self, sequence=sequence)
        return match

    def spec(self) -> str:
        return f"...{self.sequence}..."

    def create_statistics(self) -> AnywhereAdapterStatistics:
        return AnywhereAdapterStatistics(self)


class NonInternalFrontAdapter(FrontAdapter):
    """A 5' adapter that must not match inside the read."""

    description = "non-internal 5'"

    def descriptive_identifier(self) -> str:
        return "noninternal_five_prime"

    def _aligner(self):
        return self._make_aligner(self.sequence, Where.FRONT_NOT_INTERNAL.value)

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence,
            front_adapter=True,
            back_adapter=self._force_anywhere,
            internal=False,
        )

    def match_to(self, sequence: str):
        if not self.kmer_finder.kmers_present(sequence):
            return None
        alignment = self.aligner.locate(sequence)
        if self._debug:
            try:
                print_matrices(self.aligner)
            except AttributeError:
                pass
        if alignment is None:
            return None
        return RemoveBeforeMatch(*alignment, adapter=self, sequence=sequence)

    def spec(self) -> str:
        return f"X{self.sequence}..."


class NonInternalBackAdapter(BackAdapter):
    """A 3' adapter that must not match inside the read."""

    description = "non-internal 3'"

    def descriptive_identifier(self) -> str:
        return "noninternal_three_prime"

    def _aligner(self):
        return self._make_aligner(self.sequence, Where.BACK_NOT_INTERNAL.value)

    def _kmer_finder(self):
        return self._make_kmer_finder(
            self.sequence,
            back_adapter=True,
            front_adapter=self._force_anywhere,
            internal=False,
        )

    def match_to(self, sequence: str):
        if not self.kmer_finder.kmers_present(sequence):
            return None
        alignment = self.aligner.locate(sequence)
        if self._debug:
            try:
                print_matrices(self.aligner)  # pragma: no cover
            except AttributeError:
                pass
        if alignment is None:
            return None
        return RemoveAfterMatch(*alignment, adapter=self, sequence=sequence)

    def spec(self) -> str:
        return f"{self.sequence}X"


class PrefixAdapter(NonInternalFrontAdapter):
    """An anchored 5' adapter (must match at the read start, in full)."""

    description = "anchored 5'"
    allows_partial_matches = False

    def __init__(self, sequence: str, *args, **kwargs):
        kwargs["min_overlap"] = len(sequence)
        super().__init__(sequence, *args, **kwargs)

    def descriptive_identifier(self) -> str:
        return "anchored_five_prime"

    def _aligner(self):
        if not self.indels:
            return PrefixComparer(
                self.sequence,
                self.max_error_rate,
                wildcard_ref=self.adapter_wildcards,
                wildcard_query=self.read_wildcards,
                min_overlap=self.min_overlap,
            )
        else:
            return self._make_aligner(self.sequence, Where.PREFIX.value)

    def _kmer_finder(self):
        if isinstance(self.aligner, PrefixComparer):
            # The comparer is already a plain scan; a prefilter would
            # only add overhead.
            return MockKmerFinder()
        else:
            return super()._kmer_finder()

    def spec(self) -> str:
        return f"^{self.sequence}..."


class SuffixAdapter(NonInternalBackAdapter):
    """An anchored 3' adapter (must match at the read end, in full)."""

    description = "anchored 3'"
    allows_partial_matches = False

    def __init__(self, sequence: str, *args, **kwargs):
        kwargs["min_overlap"] = len(sequence)
        super().__init__(sequence, *args, **kwargs)

    def descriptive_identifier(self) -> str:
        return "anchored_three_prime"

    def _aligner(self):
        if not self.indels:
            return SuffixComparer(
                self.sequence,
                self.max_error_rate,
                wildcard_ref=self.adapter_wildcards,
                wildcard_query=self.read_wildcards,
                min_overlap=self.min_overlap,
            )
        else:
            return self._make_aligner(self.sequence, Where.SUFFIX.value)

    def _kmer_finder(self):
        if isinstance(self.aligner, SuffixComparer):
            return MockKmerFinder()
        else:
            return super()._kmer_finder()

    def spec(self) -> str:
        return f"{self.sequence}$"


class LinkedMatch(Match):
    """A match of a LinkedAdapter."""

    def __init__(
        self,
        front_match: RemoveBeforeMatch,
        back_match: RemoveAfterMatch,
        adapter: "LinkedAdapter",
    ):
        assert front_match is not None or back_match is not None
        self.front_match = front_match
        self.back_match = back_match
        self.adapter = adapter

    def __repr__(self):
        return "<LinkedMatch(front_match={!r}, back_match={}, adapter={})>".format(
            self.front_match, self.back_match, self.adapter
        )

    @property
    def score(self):
        s = 0
        if self.front_match is not None:
            s += self.front_match.score
        if self.back_match is not None:
            s += self.back_match.score
        return s

    @property
    def errors(self):
        e = 0
        if self.front_match is not None:
            e += self.front_match.errors
        if self.back_match is not None:
            e += self.back_match.errors
        return e

    def trimmed(self, read):
        if self.front_match:
            read = self.front_match.trimmed(read)
        if self.back_match:
            read = self.back_match.trimmed(read)
        return read

    def remainder_interval(self) -> Tuple[int, int]:
        matches = [
            match
            for match in [self.front_match, self.back_match]
            if match is not None
        ]
        return remainder(matches)

    def retained_adapter_interval(self) -> Tuple[int, int]:
        if self.front_match:
            start = self.front_match.rstart
            offset = self.front_match.rstop
        else:
            start = offset = 0
        if self.back_match:
            end = self.back_match.rstop + offset
        else:
            end = len(self.front_match.sequence)
        return start, end

    def get_info_records(self, read) -> List[List]:
        records = []
        for match, namesuffix in [
            (self.front_match, ";1"),
            (self.back_match, ";2"),
        ]:
            if match is None:
                continue
            record = match.get_info_records(read)[0]
            record[7] = (
                "none" if self.adapter.name is None else self.adapter.name
            ) + namesuffix
            records.append(record)
            read = match.trimmed(read)
        return records

    def match_sequence(self):
        return (
            (self.front_match.match_sequence() if self.front_match else "")
            + ","
            + (self.back_match.match_sequence() if self.back_match else "")
        )


class LinkedAdapter(Adapter):
    """A 5' adapter combined with a 3' adapter."""

    description = "linked"

    def __init__(
        self,
        front_adapter: SingleAdapter,
        back_adapter: SingleAdapter,
        front_required: bool,
        back_required: bool,
        name: Optional[str],
    ):
        super().__init__(name)
        self.front_required = front_required
        self.back_required = back_required
        # Attributes needed for the report
        self.where = "linked"
        self.name = _generate_adapter_name() if name is None else name
        self.front_adapter = front_adapter
        self.front_adapter.name = self.name
        self.back_adapter = back_adapter

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(front_adapter={self.front_adapter}, "
            f"back_adapter={self.back_adapter})"
        )

    def descriptive_identifier(self) -> str:
        return "linked"

    def enable_debug(self):
        self.front_adapter.enable_debug()
        self.back_adapter.enable_debug()

    def match_to(self, sequence: str) -> Optional[LinkedMatch]:
        front_match = self.front_adapter.match_to(sequence)
        if self.front_required and front_match is None:
            return None
        if front_match is not None:
            sequence = sequence[front_match.trim_slice()]
        back_match = self.back_adapter.match_to(sequence)
        if back_match is None and (self.back_required or front_match is None):
            return None
        return LinkedMatch(front_match, back_match, self)

    def create_statistics(self) -> LinkedAdapterStatistics:
        return LinkedAdapterStatistics(
            self, front=self.front_adapter, back=self.back_adapter
        )

    @property
    def sequence(self):
        return (
            self.front_adapter.sequence + "..." + self.back_adapter.sequence
        )

    @property
    def remove(self):
        return None

    def spec(self) -> str:
        return f"{self.front_adapter.spec()}...{self.back_adapter.spec()}"


class MultipleAdapters(Matchable):
    """Match many adapters at once and return the best match."""

    def __init__(self, adapters: Sequence[Matchable]):
        super().__init__(name="multiple_adapters")
        self._adapters = adapters

    def enable_debug(self):
        for a in self._adapters:
            a.enable_debug()

    def __getitem__(self, item):
        return self._adapters[item]

    def __len__(self):
        return len(self._adapters)

    def match_to(self, sequence: str) -> Optional[SingleMatch]:
        """Best match by score, then by fewer errors; earlier adapters win ties."""
        best_match = None
        for adapter in self._adapters:
            match = adapter.match_to(sequence)
            if match is None:
                continue
            if (
                best_match is None
                or match.score > best_match.score
                or (
                    match.score == best_match.score
                    and match.errors < best_match.errors
                )
            ):
                best_match = match
        return best_match


class AdapterIndex:
    """
    Index of multiple anchored adapters of the same type: a dict from
    every string within edit (or hamming) distance k of any adapter to
    (adapter, errors, matches). Restrictions: no wildcards either side,
    at most 3 errors.
    """

    def __init__(self, adapters, prefix: bool):
        """All given adapters must be of the same type."""
        if not adapters:
            raise ValueError("Adapter list is empty")
        for adapter in adapters:
            self._accept(adapter, prefix)
        self._adapters = adapters
        self._lengths, self._index, self._ambiguous = self._make_index()
        logger.debug(
            "String lengths in the index: %s", sorted(self._lengths, reverse=True)
        )
        if len(self._lengths) == 1:
            self._length = self._lengths[0]
            self.match_to = self._match_to_one_length
        else:
            self.match_to = self._match_to_multiple_lengths
        if prefix:
            self._make_affix = self._make_prefix
            self._make_match = self._make_prefix_match
        else:
            self._make_affix = self._make_suffix
            self._make_match = self._make_suffix_match

    def __repr__(self):
        return f"{self.__class__.__name__}(adapters={self._adapters!r})"

    @staticmethod
    def _make_suffix(s, n):
        return s[-n:]

    @staticmethod
    def _make_prefix(s, n):
        return s[:n]

    @staticmethod
    def _make_prefix_match(adapter, length, score, errors, sequence):
        return RemoveBeforeMatch(
            astart=0,
            astop=len(adapter.sequence),
            rstart=0,
            rstop=length,
            score=score,
            errors=errors,
            adapter=adapter,
            sequence=sequence,
        )

    @staticmethod
    def _make_suffix_match(adapter, length, score, errors, sequence):
        return RemoveAfterMatch(
            astart=0,
            astop=len(adapter.sequence),
            rstart=len(sequence) - length,
            rstop=len(sequence),
            score=score,
            errors=errors,
            adapter=adapter,
            sequence=sequence,
        )

    @classmethod
    def _accept(cls, adapter: SingleAdapter, prefix: bool):
        """Raise ValueError if the adapter cannot be indexed."""
        if prefix and not isinstance(adapter, PrefixAdapter):
            raise ValueError("Only 5' anchored adapters are allowed")
        elif not prefix and not isinstance(adapter, SuffixAdapter):
            raise ValueError("Only 3' anchored adapters are allowed")
        if adapter.read_wildcards:
            raise ValueError("Wildcards in the read not supported")
        if adapter.adapter_wildcards:
            raise ValueError("Wildcards in the adapter not supported")
        k = int(len(adapter) * adapter.max_error_rate)
        if k > 3:
            raise ValueError("Error rate too high")

    @classmethod
    def is_acceptable(cls, adapter: SingleAdapter, prefix: bool):
        """Whether this adapter can be used in an index."""
        try:
            cls._accept(adapter, prefix)
        except ValueError:
            return False
        return True

    def _make_index(self):
        start_time = time.time()
        max_k = max(
            (
                int(adapter.max_error_rate * len(adapter.sequence))
                for adapter in self._adapters
                if adapter.indels
            ),
            default=0,
        )
        logger.info("Building index of %s adapters ...", len(self._adapters))
        if max_k == 3:
            logger.info(
                "Three errors and indels allowed for at least one of the "
                "adapter sequences: Indexing could take long and use a lot "
                "of memory. If this becomes a problem, try --no-indels "
                "and/or --no-index."
            )
        index: Dict[str, Tuple[SingleAdapter, int, int]] = dict()
        lengths = set()
        ambiguous = {}
        for adapter in self._adapters:
            sequence = adapter.sequence
            k = int(adapter.max_error_rate * len(sequence))
            if adapter.indels:
                for s, errors, matches in edit_environment(sequence, k):
                    if s in index:
                        other_adapter, other_errors, other_matches = index[s]
                        if matches < other_matches:
                            continue
                        if other_matches == matches and s not in ambiguous:
                            ambiguous[s] = (adapter, other_adapter, k, matches)
                    index[s] = (adapter, errors, matches)
                    lengths.add(len(s))
            else:
                n = len(sequence)
                for errors in range(k + 1):
                    matches = n - errors
                    for s in hamming_sphere(sequence, errors):
                        if s in index:
                            other_adapter, other_errors, other_matches = index[s]
                            if matches < other_matches:
                                continue
                            if other_matches == matches and s not in ambiguous:
                                ambiguous[s] = (adapter, other_adapter, k, matches)
                        index[s] = (adapter, errors, matches)
                lengths.add(n)

        if ambiguous:
            logger.warning(
                "WARNING: The adapters are too similar. When creating the "
                "index, %d ambiguous sequences were found that cannot be "
                "assigned uniquely.",
                len(ambiguous),
            )
            s = next(iter(ambiguous))
            adapter, other_adapter, k, matches = ambiguous[s]
            logger.warning(
                "WARNING: For example, %r, when found in a read, would result "
                "in %s matches for both %s %r and %s %r",
                s,
                matches,
                other_adapter.name,
                other_adapter.sequence,
                adapter.name,
                adapter.sequence,
            )
            logger.warning(
                "WARNING: Reads with ambiguous sequence will *not* be trimmed."
            )
            for s in ambiguous:
                del index[s]

        elapsed = time.time() - start_time
        logger.info("Built an index containing %s strings.", len(index))
        logger.debug("Building the index took %.1f s", elapsed)
        return sorted(lengths, reverse=True), index, len(ambiguous)

    def _match_to_one_length(self, sequence: str):
        affix = self._make_affix(sequence.upper(), self._length)
        if "N" in affix:
            result = self._lookup_with_n(affix)
            if result is None:
                return None
            adapter, e, m = result
        else:
            try:
                adapter, e, m = self._index[affix]
            except KeyError:
                return None
        return self._make_match(adapter, self._length, m, e, sequence)

    def _match_to_multiple_lengths(self, sequence: str):
        affix = sequence.upper()
        best_adapter: Optional[SingleAdapter] = None
        best_length = 0
        best_m = -1
        best_e = 1000
        # Check successively shorter affixes.
        for length in self._lengths:
            if length < best_m:
                # Shorter affixes cannot reach best_m matches anymore.
                break
            affix = self._make_affix(affix, length)
            if "N" in affix:
                result = self._lookup_with_n(affix)
                if result is None:
                    continue
                adapter, e, m = result
            else:
                try:
                    adapter, e, m = self._index[affix]
                except KeyError:
                    continue
            if m > best_m or (m == best_m and e < best_e):
                best_adapter = adapter
                best_e = e
                best_m = m
                best_length = length
        if best_m == -1:
            return None
        return self._make_match(best_adapter, best_length, best_m, best_e, sequence)

    def _lookup_with_n(self, affix):
        # N wildcards count as mismatches; look up with N replaced by an
        # arbitrary base, then re-align to fix up the error/match counts.
        affix_without_n = affix.replace("N", "A")
        try:
            result = self._index[affix_without_n]
        except KeyError:
            return None
        adapter = result[0]
        match = adapter.match_to(affix)
        if match is None:
            return None
        return adapter, match.errors, match.score


class IndexedPrefixAdapters(Matchable):
    def __init__(self, adapters):
        super().__init__(name="indexed_prefix_adapters")
        self._index = AdapterIndex(adapters, prefix=True)
        self.match_to = self._index.match_to

    def match_to(self, sequence: str):
        pass


class IndexedSuffixAdapters(Matchable):
    def __init__(self, adapters):
        super().__init__(name="indexed_suffix_adapters")
        self._index = AdapterIndex(adapters, prefix=False)
        self.match_to = self._index.match_to

    def match_to(self, sequence: str):
        pass


def warn_duplicate_adapters(adapters):
    d = dict()
    for adapter in adapters:
        key = (adapter.__class__, adapter.sequence)
        if key in d:
            logger.warning(
                "Adapter %r (%s) was specified multiple times! "
                "Please make sure that this is what you want.",
                adapter.sequence,
                adapter.description,
            )
        d[key] = adapter.name


def remainder(matches: Sequence[Match]) -> Tuple[int, int]:
    """
    The section of the read that would not be trimmed, as an interval
    (start, stop) relative to the original read. matches must be
    non-empty.
    """
    if not matches:
        raise ValueError("matches must not be empty")
    start = 0
    for match in matches:
        match_start, match_stop = match.remainder_interval()
        start += match_start
    length = match_stop - match_start
    return (start, start + length)
