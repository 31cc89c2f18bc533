"""
Adapter model: types, matches, multi-adapter selection, anchored index.

Design: an adapter *type* is pure configuration. One descriptor table
(`_KINDS`) declares, per kind, the aligner flag set, whether matching
runs over reversed sequences (the rightmost variants), which read end
a match removes, the k-mer prefilter orientation, and presentation
strings. Every type shares one generic ``match_to`` driven by its
descriptor; the ten public classes exist only to carry the kind (and
to keep spec-parser/type-identity semantics). The kind names are the
same strings the batch engine dispatches on (batch_pipeline._KIND_INFO)
— the per-read path here and the batched device path are two
evaluators of the same declarative adapter program.

Capability parity with the reference adapter layer
(/root/reference/src/cutadapt/adapters.py:533-1602): ten types,
score/errors best-match selection, linked adapters, the anchored
multi-adapter index with ambiguity handling, per-adapter mergeable
statistics.
"""

import logging
import time
from abc import ABC, abstractmethod
from collections import defaultdict
from dataclasses import dataclass
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

IUPAC_CODES = frozenset("ABCDGHKMNRSTUVWXY")


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


@dataclass(frozen=True)
class AdapterKind:
    """Declarative description of one adapter type."""

    name: str  # batch-engine dispatch key
    ident: str  # identifier in JSON reports
    description: str  # human-readable type label
    flags: Where  # aligner configuration
    removes: str  # which read part a match removes: 'front'|'back'|'auto'
    reversed_match: bool = False  # align reversed seqs, mirror coords
    kmer_back: bool = False  # prefilter: k-mers may sit before read end
    kmer_front: bool = False  # prefilter: k-mers may sit at read start
    kmer_internal: bool = True  # prefilter: k-mers may sit anywhere
    anchored: bool = False  # full-length match required
    spec_format: str = "{}"  # rendering in the spec mini-language


_KINDS = {
    k.name: k
    for k in (
        AdapterKind(
            "front", "regular_five_prime", "regular 5'", Where.FRONT,
            "front", kmer_front=True, spec_format="{}...",
        ),
        AdapterKind(
            "rightmost_front", "rightmost_five_prime", "rightmost 5'",
            Where.BACK, "front", reversed_match=True, kmer_back=True,
            spec_format="{}...;rightmost",
        ),
        AdapterKind(
            "back", "regular_three_prime", "regular 3'", Where.BACK,
            "back", kmer_back=True, spec_format="{}",
        ),
        AdapterKind(
            "rightmost_back", "rightmost_three_prime", "rightmost 3'",
            Where.FRONT, "back", reversed_match=True, kmer_front=True,
            spec_format="{};rightmost",
        ),
        AdapterKind(
            "anywhere", "anywhere", "variable 5'/3'", Where.ANYWHERE,
            "auto", kmer_back=True, kmer_front=True, spec_format="...{}...",
        ),
        AdapterKind(
            "noninternal_front", "noninternal_five_prime", "non-internal 5'",
            Where.FRONT_NOT_INTERNAL, "front", kmer_front=True,
            kmer_internal=False, spec_format="X{}...",
        ),
        AdapterKind(
            "noninternal_back", "noninternal_three_prime", "non-internal 3'",
            Where.BACK_NOT_INTERNAL, "back", kmer_back=True,
            kmer_internal=False, spec_format="{}X",
        ),
        AdapterKind(
            "prefix", "anchored_five_prime", "anchored 5'", Where.PREFIX,
            "front", kmer_front=True, kmer_internal=False, anchored=True,
            spec_format="^{}...",
        ),
        AdapterKind(
            "suffix", "anchored_three_prime", "anchored 3'", Where.SUFFIX,
            "back", kmer_back=True, kmer_internal=False, anchored=True,
            spec_format="{}$",
        ),
    )
}


def print_matrices(aligner):  # pragma: no cover - debugging aid
    print("Edit distances:")
    print(aligner.dpmatrix)
    print("Scores:")
    print(aligner.scorematrix)


# --- statistics --------------------------------------------------------------


def _int_dict():
    # module-level so the defaultdicts stay picklable
    return defaultdict(int)


class EndStatistics:
    """Removal histogram for one adapter end.

    ``errors[length][e]`` counts removals of ``length`` bases found
    with ``e`` errors; ``adjacent_bases`` tallies the base immediately
    5' of 3'-matches (used for the incomplete-adapter warning). The
    histogram merges with ``+=`` (multi-worker / multi-chip reduction)
    and the batch engine lands whole event arrays via
    :meth:`record_removal`.
    """

    def __init__(self, adapter: "SingleAdapter"):
        self.max_error_rate: float = adapter.max_error_rate
        self.sequence: str = adapter.sequence
        self.effective_length: int = adapter.effective_length
        self.has_wildcards: bool = adapter.adapter_wildcards
        self.indels: bool = adapter.indels
        self.adapter_type: str = adapter.descriptive_identifier()
        self.allows_partial_matches: bool = adapter.allows_partial_matches
        self.errors: Dict[int, Dict[int, int]] = defaultdict(_int_dict)
        self.adjacent_bases = {"A": 0, "C": 0, "G": 0, "T": 0, "": 0}
        # 5'-removing adapters report their histogram against the
        # reversed sequence (the removal grows from the sequence end)
        self._remove_prefix = adapter.removes_front

    def __repr__(self):
        errors = {k: dict(v) for k, v in self.errors.items()}
        return (
            f"EndStatistics(max_error_rate={self.max_error_rate}, "
            f"errors={errors}, adjacent_bases={self.adjacent_bases})"
        )

    def record_removal(self, length: int, errors: int, count: int = 1):
        self.errors[length][errors] += count

    def record_adjacent(self, base: str, count: int = 1):
        key = base if base in ("A", "C", "G", "T") else ""
        self.adjacent_bases[key] += count

    def __iadd__(self, other: Any):
        if not isinstance(other, self.__class__):
            raise ValueError("Cannot compare")
        compatible = (
            self.max_error_rate == other.max_error_rate
            and self.sequence == other.sequence
            and self.effective_length == other.effective_length
            and self.indels == other.indels
        )
        if not compatible:
            raise RuntimeError("Incompatible EndStatistics, cannot be added")
        for base, count in other.adjacent_bases.items():
            self.adjacent_bases[base] += count
        for length, by_errors in other.errors.items():
            mine = self.errors[length]
            for e, count in by_errors.items():
                mine[e] += count
        return self

    @property
    def lengths(self):
        return {
            length: sum(by_errors.values())
            for length, by_errors in self.errors.items()
        }

    def random_match_probabilities(self, gc_content: float) -> List[float]:
        """
        p[i] = probability that i bases of this adapter end match a
        random sequence with the given GC content (indels ignored).
        """
        assert 0.0 <= gc_content <= 1.0
        seq = self.sequence[::-1] if self._remove_prefix else self.sequence
        gc_like = "CGRYSKMBDHVN" if self.has_wildcards else "GC"
        probabilities = [1.0]
        p = 1.0
        for base in seq:
            p *= gc_content / 2.0 if base in gc_like else (1.0 - gc_content) / 2.0
            probabilities.append(p)
        return probabilities


class AdapterStatistics:
    """Mergeable per-adapter tallies.

    ``front``/``back`` are EndStatistics for whichever read ends this
    adapter can remove from (None otherwise); ``kind`` labels the
    report layout: 'front', 'back', 'both' (anywhere) or 'linked'.
    """

    def __init__(
        self,
        adapter: "Adapter",
        kind: str,
        front: Optional[EndStatistics] = None,
        back: Optional[EndStatistics] = None,
    ):
        self.name = adapter.name
        self.adapter = adapter
        self.kind = kind
        self.front = front
        self.back = back
        self.reverse_complemented = 0

    def __repr__(self):
        return (
            f"AdapterStatistics(name={self.name}, kind={self.kind}, "
            f"front={self.front}, back={self.back})"
        )

    @property
    def end(self) -> EndStatistics:
        """The single end of a one-ended adapter's statistics."""
        if (self.front is None) == (self.back is None):
            raise AttributeError("adapter has statistics for both ends")
        return self.front if self.back is None else self.back

    def __iadd__(self, other: "AdapterStatistics"):
        if not isinstance(other, AdapterStatistics) or self.kind != other.kind:
            raise ValueError("Cannot iadd")
        if self.front is not None:
            self.front += other.front
        if self.back is not None:
            self.back += other.back
        self.reverse_complemented += other.reverse_complemented
        return self

    def end_statistics(self) -> Tuple[Optional[EndStatistics], Optional[EndStatistics]]:
        return self.front, self.back

    def add_match(self, match) -> None:
        if isinstance(match, LinkedMatch):
            front_part, back_part = match.front_match, match.back_match
        elif match.end == "front":
            front_part, back_part = match, None
        else:
            front_part, back_part = None, match
        if front_part is not None:
            self.front.record_removal(
                front_part.removed_sequence_length(), front_part.errors
            )
        if back_part is not None:
            self.back.record_removal(
                back_part.removed_sequence_length(), back_part.errors
            )
            self.back.record_adjacent(back_part.adjacent_base())


# --- matches -----------------------------------------------------------------


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


class AdapterMatch(Match):
    """One adapter aligned to one read.

    Coordinates: adapter[astart:astop] aligned to sequence[rstart:rstop].
    ``end`` says which read part the match removes: a 'front' match
    removes ``read[:rstop]``, a 'back' match removes ``read[rstart:]``.
    """

    __slots__ = (
        "astart",
        "astop",
        "rstart",
        "rstop",
        "score",
        "errors",
        "adapter",
        "sequence",
        "end",
    )

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
        end: str,
    ):
        assert end in ("front", "back")
        self.astart = astart
        self.astop = astop
        self.rstart = rstart
        self.rstop = rstop
        self.score = score
        self.errors = errors
        self.adapter = adapter
        self.sequence = sequence
        self.end = end

    @property
    def length(self) -> int:
        """Aligned adapter characters (differs from read characters
        when there are indels)."""
        return self.astop - self.astart

    @property
    def is_front(self) -> bool:
        return self.end == "front"

    def __repr__(self):
        return (
            f"{self.__class__.__name__}(astart={self.astart}, "
            f"astop={self.astop}, rstart={self.rstart}, rstop={self.rstop}, "
            f"score={self.score}, errors={self.errors}, end={self.end!r})"
        )

    def __eq__(self, other) -> bool:
        return (
            other.__class__ is self.__class__
            and (self.astart, self.astop, self.rstart, self.rstop)
            == (other.astart, other.astop, other.rstart, other.rstop)
            and (self.score, self.errors, self.end)
            == (other.score, other.errors, other.end)
            and self.adapter is other.adapter
            and self.sequence == other.sequence
        )

    def wildcards(self, wildcard_char: str = "N") -> str:
        """The read characters that the adapter's wildcards matched."""
        positions = range(self.astop - self.astart)
        return "".join(
            self.sequence[self.rstart + i]
            for i in positions
            if self.adapter.sequence[self.astart + i] == wildcard_char
            and self.rstart + i < len(self.sequence)
        )

    def get_info_records(self, read) -> List[List]:
        seq = read.sequence
        qualities = read.qualities
        pieces = (
            seq[: self.rstart],
            seq[self.rstart : self.rstop],
            seq[self.rstop :],
        )
        if qualities:
            quality_pieces = (
                qualities[: self.rstart],
                qualities[self.rstart : self.rstop],
                qualities[self.rstop :],
            )
        else:
            quality_pieces = ("", "", "")
        return [
            ["", self.errors, self.rstart, self.rstop, *pieces,
             self.adapter.name, *quality_pieces]
        ]

    def match_sequence(self):
        return self.sequence[self.rstart : self.rstop]

    # trimming geometry ------------------------------------------------

    def trim_slice(self) -> slice:
        if self.is_front:
            return slice(self.rstop, None)
        return slice(None, self.rstart)

    def trimmed(self, read):
        return read[self.trim_slice()]

    def rest(self) -> str:
        """The read part on the far side of the match."""
        if self.is_front:
            return self.sequence[: self.rstart]
        return self.sequence[self.rstop :]

    def remainder_interval(self) -> Tuple[int, int]:
        if self.is_front:
            return self.rstop, len(self.sequence)
        return 0, self.rstart

    def retained_adapter_interval(self) -> Tuple[int, int]:
        if self.is_front:
            return self.rstart, len(self.sequence)
        return 0, self.rstop

    def removed_sequence_length(self) -> int:
        if self.is_front:
            return self.rstop
        return len(self.sequence) - self.rstart

    def adjacent_base(self) -> str:
        """The base 5' of a 3' match ('' at the read start)."""
        return self.sequence[self.rstart - 1 : self.rstart]


def _front_match(adapter, length, score, errors, sequence) -> AdapterMatch:
    return AdapterMatch(
        0, len(adapter.sequence), 0, length, score, errors, adapter,
        sequence, "front",
    )


def _back_match(adapter, length, score, errors, sequence) -> AdapterMatch:
    n = len(sequence)
    return AdapterMatch(
        0, len(adapter.sequence), n - length, n, score, errors, adapter,
        sequence, "back",
    )


# --- adapter types -----------------------------------------------------------


_adapter_counter = [0]


def _next_auto_name() -> str:
    _adapter_counter[0] += 1
    return str(_adapter_counter[0])


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


class SingleAdapter(Adapter):
    """
    One adapter sequence matched according to its kind descriptor.

    The sequence is uppercased with U->T and I->N. ``max_errors``
    values >= 1 mean an absolute error budget and are converted to a
    rate over the sequence's non-N length. Wildcard-aware matching is
    only enabled when the sequence actually contains IUPAC codes
    beyond ACGT.
    """

    kind: str = ""  # overridden by each concrete type

    def __init__(
        self,
        sequence: str,
        max_errors: float = 0.1,
        min_overlap: int = 3,
        read_wildcards: bool = False,
        adapter_wildcards: bool = True,
        name: Optional[str] = None,
        indels: bool = True,
        force_anywhere: bool = False,
    ):
        self.name: str = name if name is not None else _next_auto_name()
        super().__init__(self.name)
        self._debug: bool = False
        self._force_anywhere = force_anywhere
        info = _KINDS[self.kind]
        self._info = info
        self.sequence = sequence.upper().replace("U", "T").replace("I", "N")
        if not self.sequence:
            raise ValueError("Adapter sequence is empty")
        plain_length = len(self.sequence) - self.sequence.count("N")
        if max_errors >= 1 and plain_length > 0:
            max_errors /= plain_length
        self.max_error_rate: float = max_errors
        if info.anchored:
            min_overlap = len(self.sequence)
        self.min_overlap: int = min(min_overlap, len(self.sequence))
        if adapter_wildcards:
            bad = set(self.sequence) - IUPAC_CODES
            if bad:
                char = next(c for c in self.sequence if c in bad)
                raise InvalidCharacter(
                    f"Character '{char}' in adapter sequence "
                    f"'{self.sequence}' is not a valid IUPAC code. "
                    "Use only characters 'ABCDGHIKMNRSTUVWXY'."
                )
        self.adapter_wildcards: bool = (
            adapter_wildcards and not set(self.sequence) <= set("ACGT")
        )
        self.read_wildcards: bool = read_wildcards
        self.indels: bool = indels
        self.aligner = self._make_matcher()
        self.kmer_finder = self._make_kmer_finder()

    # type properties derived from the descriptor ----------------------

    @property
    def description(self) -> str:
        return self._info.description

    @property
    def removes_front(self) -> bool:
        return self._info.removes == "front"

    @property
    def allows_partial_matches(self) -> bool:
        return not self._info.anchored

    def descriptive_identifier(self) -> str:
        return self._info.ident

    def spec(self) -> str:
        return self._info.spec_format.format(self.sequence)

    def __repr__(self):
        return (
            f"<{self.__class__.__name__}(name={self.name!r}, "
            f"sequence={self.sequence!r}, "
            f"max_error_rate={self.max_error_rate}, "
            f"min_overlap={self.min_overlap}, "
            f"read_wildcards={self.read_wildcards}, "
            f"adapter_wildcards={self.adapter_wildcards}, "
            f"indels={self.indels})>"
        )

    def __len__(self) -> int:
        return len(self.sequence)

    # matcher construction ---------------------------------------------

    @property
    def _match_sequence(self) -> str:
        """The sequence as handed to aligner/prefilter (reversed for
        rightmost variants)."""
        if self._info.reversed_match:
            return self.sequence[::-1]
        return self.sequence

    def _use_comparer(self) -> bool:
        return self._info.anchored and not self.indels

    def _make_matcher(self):
        if self._use_comparer():
            comparer_class = (
                PrefixComparer if self.removes_front else SuffixComparer
            )
            return comparer_class(
                self.sequence,
                self.max_error_rate,
                wildcard_ref=self.adapter_wildcards,
                wildcard_query=self.read_wildcards,
                min_overlap=self.min_overlap,
            )
        flags = (
            Where.ANYWHERE if self._force_anywhere else self._info.flags
        )
        return Aligner(
            self._match_sequence,
            self.max_error_rate,
            flags=flags.value,
            wildcard_ref=self.adapter_wildcards,
            wildcard_query=self.read_wildcards,
            # indels are disabled by pricing them out
            indel_cost=1 if self.indels else 100000,
            min_overlap=self.min_overlap,
        )

    def _make_kmer_finder(self) -> Union[KmerFinder, MockKmerFinder]:
        if self._use_comparer():
            # the comparer is already a single plain scan; prefiltering
            # would only add overhead
            return MockKmerFinder()
        info = self._info
        back, front = info.kmer_back, info.kmer_front
        if self._force_anywhere:
            back = front = True
        positions_and_kmers = create_positions_and_kmers(
            self._match_sequence,
            self.min_overlap,
            self.max_error_rate,
            back_adapter=back,
            front_adapter=front,
            internal=info.kmer_internal,
        )
        if self._debug:
            print(kmer_probability_analysis(positions_and_kmers))
        try:
            return KmerFinder(
                positions_and_kmers, self.adapter_wildcards, self.read_wildcards
            )
        except ValueError:
            # k-mers too long for the shift-and machine word
            return MockKmerFinder()

    @property
    def effective_length(self) -> int:
        return self.aligner.effective_length

    def enable_debug(self) -> None:
        self._debug = True
        self.aligner.enable_debug()

    # matching ---------------------------------------------------------

    def match_to(self, sequence: str) -> Optional[AdapterMatch]:
        """Match this adapter against ``sequence``; return the best
        acceptable AdapterMatch or None."""
        info = self._info
        probe = sequence[::-1] if info.reversed_match else sequence
        if not self.kmer_finder.kmers_present(probe):
            return None
        hit = self.aligner.locate(probe)
        if self._debug:
            try:
                print_matrices(self.aligner)
            except AttributeError:
                pass
        if hit is None:
            return None
        astart, astop, rstart, rstop, score, errors = hit
        if info.reversed_match:
            m, n = len(self.sequence), len(sequence)
            astart, astop = m - astop, m - astart
            rstart, rstop = n - rstop, n - rstart
        end = info.removes
        if end == "auto":
            # a match flush with the read start acts as a 5' adapter
            end = "front" if rstart == 0 else "back"
        return AdapterMatch(
            astart, astop, rstart, rstop, score, errors, self, sequence, end
        )

    def create_statistics(self) -> AdapterStatistics:
        if self._info.removes == "auto":
            return AdapterStatistics(
                self, "both",
                front=EndStatistics(self), back=EndStatistics(self),
            )
        if self.removes_front:
            return AdapterStatistics(self, "front", front=EndStatistics(self))
        return AdapterStatistics(self, "back", back=EndStatistics(self))


class FrontAdapter(SingleAdapter):
    """A 5' adapter."""

    kind = "front"


class RightmostFrontAdapter(FrontAdapter):
    """A 5' adapter that prefers rightmost matches (matching runs over
    the reversed sequences; coordinates are mirrored back)."""

    kind = "rightmost_front"


class BackAdapter(SingleAdapter):
    """A 3' adapter."""

    kind = "back"


class RightmostBackAdapter(BackAdapter):
    """A 3' adapter that prefers rightmost matches."""

    kind = "rightmost_back"


class AnywhereAdapter(SingleAdapter):
    """
    An adapter that can be 5' or 3'. If the match starts at the first
    base of the read, it is treated as 5', otherwise as 3'.
    """

    kind = "anywhere"


class NonInternalFrontAdapter(FrontAdapter):
    """A 5' adapter that must not match inside the read."""

    kind = "noninternal_front"


class NonInternalBackAdapter(BackAdapter):
    """A 3' adapter that must not match inside the read."""

    kind = "noninternal_back"


class PrefixAdapter(NonInternalFrontAdapter):
    """An anchored 5' adapter (must match at the read start, in full)."""

    kind = "prefix"


class SuffixAdapter(NonInternalBackAdapter):
    """An anchored 3' adapter (must match at the read end, in full)."""

    kind = "suffix"


# --- linked adapters ---------------------------------------------------------


class LinkedMatch(Match):
    """A match of a LinkedAdapter (either phase may be None)."""

    def __init__(
        self,
        front_match: Optional[AdapterMatch],
        back_match: Optional[AdapterMatch],
        adapter: "LinkedAdapter",
    ):
        assert front_match is not None or back_match is not None
        self.front_match = front_match
        self.back_match = back_match
        self.adapter = adapter

    def __repr__(self):
        return (
            f"<LinkedMatch(front_match={self.front_match!r}, "
            f"back_match={self.back_match}, adapter={self.adapter})>"
        )

    @property
    def score(self) -> int:
        return sum(
            phase.score
            for phase in (self.front_match, self.back_match)
            if phase is not None
        )

    @property
    def errors(self) -> int:
        return sum(
            phase.errors
            for phase in (self.front_match, self.back_match)
            if phase is not None
        )

    def trimmed(self, read):
        if self.front_match:
            read = self.front_match.trimmed(read)
        if self.back_match:
            read = self.back_match.trimmed(read)
        return read

    def remainder_interval(self) -> Tuple[int, int]:
        phases = [
            phase
            for phase in (self.front_match, self.back_match)
            if phase is not None
        ]
        return remainder(phases)

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
        for phase, suffix in ((self.front_match, ";1"), (self.back_match, ";2")):
            if phase is None:
                continue
            record = phase.get_info_records(read)[0]
            base_name = (
                "none" if self.adapter.name is None else self.adapter.name
            )
            record[7] = base_name + suffix
            records.append(record)
            read = phase.trimmed(read)
        return records

    def match_sequence(self):
        front = self.front_match.match_sequence() if self.front_match else ""
        back = self.back_match.match_sequence() if self.back_match else ""
        return f"{front},{back}"


class LinkedAdapter(Adapter):
    """A 5' adapter combined with a 3' adapter: the 5' phase is trimmed
    first, then the 3' phase is searched in the remainder."""

    description = "linked"
    kind = "linked"

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
        self.where = "linked"  # report attribute
        self.name = _next_auto_name() if name is None else name
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
        if front_match is None and self.front_required:
            return None
        if front_match is not None:
            sequence = sequence[front_match.trim_slice()]
        back_match = self.back_adapter.match_to(sequence)
        if back_match is None and (self.back_required or front_match is None):
            return None
        return LinkedMatch(front_match, back_match, self)

    def create_statistics(self) -> AdapterStatistics:
        return AdapterStatistics(
            self, "linked",
            front=EndStatistics(self.front_adapter),
            back=EndStatistics(self.back_adapter),
        )

    @property
    def sequence(self):
        return f"{self.front_adapter.sequence}...{self.back_adapter.sequence}"

    @property
    def remove(self):
        return None

    def spec(self) -> str:
        return f"{self.front_adapter.spec()}...{self.back_adapter.spec()}"


# --- multi-adapter matching --------------------------------------------------


class MultipleAdapters(Matchable):
    """Match many adapters at once and return the best match."""

    def __init__(self, adapters: Sequence[Matchable]):
        super().__init__(name="multiple_adapters")
        self._adapters = adapters

    def enable_debug(self):
        for adapter in self._adapters:
            adapter.enable_debug()

    def __getitem__(self, item):
        return self._adapters[item]

    def __len__(self) -> int:
        return len(self._adapters)

    def match_to(self, sequence: str):
        """Best match by score, then by fewer errors; earlier adapters
        win ties."""
        best = None
        for adapter in self._adapters:
            match = adapter.match_to(sequence)
            if match is None:
                continue
            if (
                best is None
                or match.score > best.score
                or (match.score == best.score and match.errors < best.errors)
            ):
                best = match
        return best


class AdapterIndex:
    """
    Exact-lookup index over multiple anchored adapters of one type: a
    dict from every string within edit (or, without indels, hamming)
    distance k of any adapter to (adapter, errors, matches). Only
    wildcard-free adapters with at most 3 errors can be indexed.
    """

    def __init__(self, adapters, prefix: bool):
        """All given adapters must be of the same type."""
        if not adapters:
            raise ValueError("Adapter list is empty")
        for adapter in adapters:
            self._accept(adapter, prefix)
        self._adapters = adapters
        self._prefix = prefix
        self._lengths, self._index, self._ambiguous = self._build()
        logger.debug(
            "String lengths in the index: %s",
            sorted(self._lengths, reverse=True),
        )
        if len(self._lengths) == 1:
            self._length = self._lengths[0]
            self.match_to = self._match_one_length
        else:
            self.match_to = self._match_multiple_lengths

    def __repr__(self):
        return f"{self.__class__.__name__}(adapters={self._adapters!r})"

    def _affix(self, s: str, n: int) -> str:
        return s[:n] if self._prefix else s[-n:]

    def _make_match(self, adapter, length, score, errors, sequence):
        builder = _front_match if self._prefix else _back_match
        return builder(adapter, length, score, errors, sequence)

    @classmethod
    def _accept(cls, adapter: SingleAdapter, prefix: bool):
        """Raise ValueError if the adapter cannot be indexed."""
        required = PrefixAdapter if prefix else SuffixAdapter
        if not isinstance(adapter, required):
            where = "5'" if prefix else "3'"
            raise ValueError(f"Only {where} anchored adapters are allowed")
        if adapter.read_wildcards:
            raise ValueError("Wildcards in the read not supported")
        if adapter.adapter_wildcards:
            raise ValueError("Wildcards in the adapter not supported")
        if int(len(adapter) * adapter.max_error_rate) > 3:
            raise ValueError("Error rate too high")

    @classmethod
    def is_acceptable(cls, adapter: SingleAdapter, prefix: bool) -> bool:
        """Whether this adapter can be used in an index."""
        try:
            cls._accept(adapter, prefix)
        except ValueError:
            return False
        return True

    def _environment(self, adapter):
        """Yield (string, errors, matches) for every string within the
        adapter's error budget."""
        sequence = adapter.sequence
        k = int(adapter.max_error_rate * len(sequence))
        if adapter.indels:
            yield from edit_environment(sequence, k)
        else:
            for errors in range(k + 1):
                matches = len(sequence) - errors
                for s in hamming_sphere(sequence, errors):
                    yield s, errors, matches

    def _build(self):
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
        index: Dict[str, Tuple[SingleAdapter, int, int]] = {}
        lengths = set()
        ambiguous = {}
        for adapter in self._adapters:
            k = int(adapter.max_error_rate * len(adapter.sequence))
            for s, errors, matches in self._environment(adapter):
                claimed = index.get(s)
                if claimed is not None:
                    other_adapter, _, other_matches = claimed
                    if matches < other_matches:
                        continue
                    if other_matches == matches and s not in ambiguous:
                        ambiguous[s] = (adapter, other_adapter, k, matches)
                index[s] = (adapter, errors, matches)
                lengths.add(len(s))

        if ambiguous:
            logger.warning(
                "WARNING: The adapters are too similar. When creating the "
                "index, %d ambiguous sequences were found that cannot be "
                "assigned uniquely.",
                len(ambiguous),
            )
            example = next(iter(ambiguous))
            adapter, other_adapter, k, matches = ambiguous[example]
            logger.warning(
                "WARNING: For example, %r, when found in a read, would result "
                "in %s matches for both %s %r and %s %r",
                example,
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

        logger.info("Built an index containing %s strings.", len(index))
        logger.debug(
            "Building the index took %.1f s", time.time() - start_time
        )
        return sorted(lengths, reverse=True), index, len(ambiguous)

    def _match_one_length(self, sequence: str):
        affix = self._affix(sequence.upper(), self._length)
        if "N" in affix:
            hit = self._lookup_with_n(affix)
        else:
            hit = self._index.get(affix)
        if hit is None:
            return None
        adapter, errors, matches = hit
        return self._make_match(adapter, self._length, matches, errors, sequence)

    def _match_multiple_lengths(self, sequence: str):
        affix = sequence.upper()
        best = None  # (matches, -errors, adapter, length)
        # check successively shorter affixes; stop once no shorter
        # affix could beat the best match count found so far
        for length in self._lengths:
            if best is not None and length < best[0]:
                break
            affix = self._affix(affix, length)
            if "N" in affix:
                hit = self._lookup_with_n(affix)
            else:
                hit = self._index.get(affix)
            if hit is None:
                continue
            adapter, errors, matches = hit
            if best is None or (matches, -errors) > (best[0], -best[1]):
                best = (matches, errors, adapter, length)
        if best is None:
            return None
        matches, errors, adapter, length = best
        return self._make_match(adapter, length, matches, errors, sequence)

    def _lookup_with_n(self, affix):
        # N wildcards count as mismatches; look up with N replaced by
        # an arbitrary base, then re-align to fix the error/match counts
        hit = self._index.get(affix.replace("N", "A"))
        if hit is None:
            return None
        adapter = hit[0]
        match = adapter.match_to(affix)
        if match is None:
            return None
        return adapter, match.errors, match.score


class IndexedPrefixAdapters(Matchable):
    kind = "indexed_prefix"

    def __init__(self, adapters):
        super().__init__(name="indexed_prefix_adapters")
        self._index = AdapterIndex(adapters, prefix=True)
        self.match_to = self._index.match_to

    def match_to(self, sequence: str):
        pass


class IndexedSuffixAdapters(Matchable):
    kind = "indexed_suffix"

    def __init__(self, adapters):
        super().__init__(name="indexed_suffix_adapters")
        self._index = AdapterIndex(adapters, prefix=False)
        self.match_to = self._index.match_to

    def match_to(self, sequence: str):
        pass


def warn_duplicate_adapters(adapters):
    seen = {}
    for adapter in adapters:
        key = (adapter.__class__, adapter.sequence)
        if key in seen:
            logger.warning(
                "Adapter %r (%s) was specified multiple times! "
                "Please make sure that this is what you want.",
                adapter.sequence,
                adapter.description,
            )
        seen[key] = adapter.name


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
    return (start, start + match_stop - match_start)
