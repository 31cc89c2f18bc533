"""
Statistics collection and report rendering (text, minimal TSV, JSON).

The Statistics object is the single mergeable summary of a run: every
field either sums, Counter-merges, or must agree across shards, and
``+=`` applies the right rule per field. That merge contract is what
multicore workers and the sharded TPU engine rely on — per-chip
counter tensors reduce on device (psum), land in these objects, and
render identically to a single-shard run.

Rendering is split per concern: a summary block, a read-fate table, a
per-adapter section laid out by the adapter statistics' kind
('front' / 'back' / 'both' / 'linked'), and poly-A tables. The exact
output text is a compatibility surface (byte-parity with the
reference's reports, /root/reference/src/cutadapt/report.py:81-900)
and must not drift.
"""

import textwrap
from collections import Counter, defaultdict
from dataclasses import dataclass
from io import StringIO
from typing import Any, Dict, Iterator, List, Mapping, Optional, Tuple

from .adapters import (
    AdapterStatistics,
    AnywhereAdapter,
    BackAdapter,
    EndStatistics,
    FrontAdapter,
    LinkedAdapter,
    SingleAdapter,
)
from .json_utils import OneLine
from .modifiers import (
    AdapterCutter,
    NextseqQualityTrimmer,
    PairedAdapterCutter,
    PairedEndModifierWrapper,
    PairedReverseComplementer,
    PolyATrimmer,
    QualityTrimmer,
    ReverseComplementer,
)
from .statistics import ReadLengthStatistics
from .steps import HasFilterStatistics, HasStatistics

FILTERS = {
    "too_short": "that were too short",
    "too_long": "that were too long",
    "too_many_n": "with too many N",
    "too_many_expected_errors": "with too many exp. errors",
    "casava_filtered": "failed CASAVA filter",
    "discard_trimmed": "discarded as trimmed",
    "discard_untrimmed": "discarded as untrimmed",
}


def safe_divide(numerator: Optional[int], denominator: int) -> float:
    if numerator is None or not denominator:
        return 0.0
    return numerator / denominator


def add_if_not_none(a: Optional[int], b: Optional[int]) -> Optional[int]:
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _merge_optional_counter(
    mine: Optional[Dict[int, int]], theirs: Optional[Dict[int, int]]
) -> Optional[Dict[int, int]]:
    if mine is None:
        return theirs
    if theirs is None:
        return mine
    return defaultdict(int, Counter(mine) + Counter(theirs))


class Statistics:
    """Mergeable summary of one (partial) run."""

    def __init__(self) -> None:
        self.paired: Optional[bool] = None
        # filter name -> number of filtered reads/read pairs
        self.filtered: Dict[str, int] = defaultdict(int)
        self.reverse_complemented: Optional[int] = None
        self.n = 0
        self.total_bp = [0, 0]
        self.read_length_statistics = ReadLengthStatistics()
        self.with_adapters: List[Optional[int]] = [None, None]
        self.quality_trimmed_bp: List[Optional[int]] = [None, None]
        self.poly_a_trimmed_lengths: List[Optional[Dict[int, int]]] = [None, None]
        self.adapter_stats: List[List[AdapterStatistics]] = [[], []]
        self._collected: bool = False

    # --- merging (the shard-reduction contract) -----------------------

    def __iadd__(self, other: Any):
        if not isinstance(other, Statistics):
            raise ValueError(f"Cannot add {other.__class__.__name__}")
        if self.paired is None:
            self.paired = other.paired
        elif self.paired != other.paired:
            raise ValueError("Incompatible Statistics: paired is not equal")

        self.n += other.n
        self.read_length_statistics += other.read_length_statistics
        self.reverse_complemented = add_if_not_none(
            self.reverse_complemented, other.reverse_complemented
        )
        for name, count in other.filtered.items():
            self.filtered[name] += count

        for side in (0, 1):
            self.total_bp[side] += other.total_bp[side]
            self.with_adapters[side] = add_if_not_none(
                self.with_adapters[side], other.with_adapters[side]
            )
            self.quality_trimmed_bp[side] = add_if_not_none(
                self.quality_trimmed_bp[side], other.quality_trimmed_bp[side]
            )
            self.poly_a_trimmed_lengths[side] = _merge_optional_counter(
                self.poly_a_trimmed_lengths[side],
                other.poly_a_trimmed_lengths[side],
            )
            self._merge_adapter_stats(side, other.adapter_stats[side])
        return self

    def _merge_adapter_stats(self, side: int, theirs: List[AdapterStatistics]):
        mine = self.adapter_stats[side]
        if not theirs:
            return
        if not mine:
            self.adapter_stats[side] = theirs
            return
        if len(mine) != len(theirs):
            raise ValueError(
                "Incompatible Statistics objects (adapter_stats length)"
            )
        for j, other_stats in enumerate(theirs):
            mine[j] += other_stats

    # --- collection from pipeline objects -----------------------------

    def collect(
        self, n: int, total_bp1: int, total_bp2: Optional[int], modifiers, steps
    ):
        """
        n -- total number of reads
        total_bp1 -- number of bases in first reads
        total_bp2 -- number of bases in second reads; None for single-end
        """
        if self._collected:
            raise ValueError("Cannot call Statistics.collect more than once")
        self.n = n
        self.total_bp[0] = total_bp1
        self.paired = total_bp2 is not None
        if total_bp2 is not None:
            self.total_bp[1] = total_bp2

        for step in steps:
            if isinstance(step, HasStatistics):
                self.read_length_statistics += step.get_statistics()
            if isinstance(step, HasFilterStatistics):
                self.filtered[step.descriptive_identifier()] = step.filtered()
        for modifier in modifiers:
            self._collect_modifier(modifier)
        self._collected = True
        return self

    def _take_cutter(self, side: int, cutter: AdapterCutter) -> None:
        """Fold one AdapterCutter's tallies into one read side."""
        if self.with_adapters[side] is None:
            self.with_adapters[side] = cutter.with_adapters
            self.adapter_stats[side] = list(cutter.adapter_statistics.values())
        else:
            self.with_adapters[side] += cutter.with_adapters
            self.adapter_stats[side] += list(cutter.adapter_statistics.values())

    def _collect_modifier(self, m) -> None:
        if isinstance(m, PairedAdapterCutter):
            for side in (0, 1):
                self.with_adapters[side] = m.with_adapters
                self.adapter_stats[side] = list(
                    m.adapter_statistics[side].values()
                )
            return
        if isinstance(m, PairedEndModifierWrapper):
            per_side = [(0, m._modifier1), (1, m._modifier2)]
        elif isinstance(m, PairedReverseComplementer):
            per_side = [(0, m.adapter_cutter1), (1, m.adapter_cutter2)]
            self.reverse_complemented = m.reverse_complemented
        else:
            per_side = [(0, m)]
        for side, modifier in per_side:
            if isinstance(modifier, (QualityTrimmer, NextseqQualityTrimmer)):
                self.quality_trimmed_bp[side] = add_if_not_none(
                    self.quality_trimmed_bp[side], modifier.trimmed_bases
                )
            if isinstance(modifier, PolyATrimmer):
                self.poly_a_trimmed_lengths[side] = modifier.trimmed_bases
            elif isinstance(modifier, AdapterCutter):
                self._take_cutter(side, modifier)
            elif isinstance(modifier, ReverseComplementer):
                first = self.with_adapters[side] is None
                self._take_cutter(side, modifier.adapter_cutter)
                if first:
                    self.reverse_complemented = modifier.reverse_complemented
                else:
                    self.reverse_complemented = add_if_not_none(
                        self.reverse_complemented, modifier.reverse_complemented
                    )

    # --- JSON ----------------------------------------------------------

    def as_json(self, gc_content: float = 0.5, one_line: bool = False) -> Dict:
        """Return a dict representation suitable for the JSON report."""
        filtered = {name: self.filtered.get(name) for name in FILTERS.keys()}
        filtered_total = sum(self.filtered.values())
        written_reads = self.read_length_statistics.written_reads()
        written_bp = self.read_length_statistics.written_bp()
        assert written_reads + filtered_total == self.n
        return {
            "read_counts": {  # pairs or reads
                "input": self.n,
                "filtered": filtered,
                "output": written_reads,
                "reverse_complemented": self.reverse_complemented,
                "read1_with_adapter": self.with_adapters[0],
                "read2_with_adapter": (
                    self.with_adapters[1] if self.paired else None
                ),
            },
            "basepair_counts": {
                "input": self.total,
                "input_read1": self.total_bp[0],
                "input_read2": self.total_bp[1] if self.paired else None,
                "quality_trimmed": self.quality_trimmed,
                "quality_trimmed_read1": self.quality_trimmed_bp[0],
                "quality_trimmed_read2": self.quality_trimmed_bp[1],
                "poly_a_trimmed": self.poly_a_trimmed,
                "poly_a_trimmed_read1": self.poly_a_trimmed_bp[0],
                "poly_a_trimmed_read2": self.poly_a_trimmed_bp[1],
                "output": self.total_written_bp,
                "output_read1": written_bp[0],
                "output_read2": written_bp[1] if self.paired else None,
            },
            "adapters_read1": [
                self._adapter_statistics_as_json(
                    astats, self.n, gc_content, one_line=one_line
                )
                for astats in self.adapter_stats[0]
            ],
            "adapters_read2": (
                [
                    self._adapter_statistics_as_json(
                        astats, self.n, gc_content, one_line=one_line
                    )
                    for astats in self.adapter_stats[1]
                ]
                if self.paired
                else None
            ),
            "poly_a_trimmed_read1": self._poly_a_trimmed_as_json(
                self.poly_a_trimmed_lengths[0]
            ),
            "poly_a_trimmed_read2": self._poly_a_trimmed_as_json(
                self.poly_a_trimmed_lengths[1]
            ),
        }

    def _adapter_statistics_as_json(
        self,
        adapter_statistics: AdapterStatistics,
        n: int,
        gc_content: float,
        one_line: bool = False,
    ):
        make_line = OneLine if one_line else (lambda value: value)
        ends: List[Optional[Dict[str, Any]]] = []
        total_trimmed_reads = 0
        for end_statistics in adapter_statistics.end_statistics():
            if end_statistics is None:
                ends.append(None)
                continue
            total = sum(end_statistics.lengths.values())
            total_trimmed_reads += total
            if end_statistics.allows_partial_matches:
                eranges = error_range_lengths(
                    end_statistics.effective_length,
                    end_statistics.max_error_rate,
                )
            else:
                eranges = None
            base_stats = AdjacentBaseStatistics(end_statistics.adjacent_bases)
            ends.append(
                {
                    "type": end_statistics.adapter_type,
                    "sequence": end_statistics.sequence,
                    "error_rate": end_statistics.max_error_rate,
                    "indels": end_statistics.indels,
                    "error_lengths": make_line(eranges),
                    "matches": total,
                    "adjacent_bases": base_stats.as_json(),
                    "dominant_adjacent_base": base_stats.warnbase,
                    "trimmed_lengths": [
                        make_line(
                            {
                                "len": row.length,
                                "expect": round(row.expect, 1),
                                "counts": row.error_counts,
                            }
                        )
                        for row in histogram_rows(end_statistics, n, gc_content)
                    ],
                }
            )
        return {
            "name": adapter_statistics.name,
            "total_matches": total_trimmed_reads,
            "on_reverse_complement": (
                adapter_statistics.reverse_complemented
                if self.reverse_complemented
                else None
            ),
            "linked": isinstance(adapter_statistics.adapter, LinkedAdapter),
            "five_prime_end": ends[0],
            "three_prime_end": ends[1],
        }

    @staticmethod
    def _poly_a_trimmed_as_json(poly_a):
        if poly_a is None:
            return None
        return [
            OneLine({"len": length, "count": poly_a[length]})
            for length in sorted(poly_a)
        ]

    # --- derived quantities --------------------------------------------

    @property
    def total(self) -> int:
        return sum(self.total_bp)

    @property
    def quality_trimmed(self) -> Optional[int]:
        return add_if_not_none(*self.quality_trimmed_bp)

    @property
    def poly_a_trimmed_bp(self) -> Tuple[Optional[int], Optional[int]]:
        def bp(side: int) -> Optional[int]:
            lengths = self.poly_a_trimmed_lengths[side]
            if lengths is None:
                return None
            return sum(length * count for length, count in lengths.items())

        return (bp(0), bp(1))

    @property
    def poly_a_trimmed(self) -> Optional[int]:
        return add_if_not_none(*self.poly_a_trimmed_bp)

    @property
    def total_written_bp(self) -> int:
        return sum(self.read_length_statistics.written_bp())

    @property
    def written(self) -> int:
        return self.read_length_statistics.written_reads()

    @property
    def written_fraction(self) -> float:
        return safe_divide(self.written, self.n)

    @property
    def with_adapters_fraction(self) -> List[float]:
        return [safe_divide(v, self.n) for v in self.with_adapters]

    @property
    def quality_trimmed_fraction(self) -> float:
        return safe_divide(self.quality_trimmed, self.total)

    @property
    def written_bp(self) -> Tuple[int, int]:
        return self.read_length_statistics.written_bp()

    @property
    def total_written_bp_fraction(self) -> float:
        return safe_divide(self.total_written_bp, self.total)

    @property
    def reverse_complemented_fraction(self) -> float:
        return safe_divide(self.reverse_complemented, self.n)

    def filtered_fraction(self, filter_name: str) -> float:
        return safe_divide(self.filtered.get(filter_name), self.n)

    @property
    def poly_a_trimmed_fraction(self) -> float:
        return safe_divide(self.poly_a_trimmed, self.total)


# --- error-range table -------------------------------------------------------


def error_range_lengths(length: int, error_rate: float) -> List[int]:
    """Longest overlap length for each allowed error count, ascending:
    element e is the largest length at which e errors are accepted."""
    lengths = [
        int(errors / error_rate) - 1
        for errors in range(1, int(error_rate * length) + 1)
    ]
    if not lengths or lengths[-1] < length:
        lengths.append(length)
    return lengths


class ErrorRanges:
    """Pretty-printer for the allowed-errors-by-length table."""

    def __init__(self, length: int, error_rate: float):
        self.length = length
        self.error_rate = error_rate
        self._lengths = error_range_lengths(length, error_rate)

    def __repr__(self):
        return (
            "ErrorRanges("
            f"length={self.length}, error_rate={self.error_rate}, "
            f"_lengths={self._lengths})"
        )

    def __str__(self):
        parts = []
        lower = 1
        for errors, upper in enumerate(self._lengths[:-1]):
            parts.append(f"{lower}-{upper} bp: {errors}; ")
            lower = upper + 1
        final_errors = len(self._lengths) - 1
        last = self._lengths[-1]
        if lower == last:
            parts.append(f"{lower} bp: {final_errors}")
        else:
            parts.append(f"{lower}-{last} bp: {final_errors}")
        return "".join(parts)

    def lengths(self):
        return self._lengths


def error_ranges(end_statistics: EndStatistics) -> str:
    length = end_statistics.effective_length
    error_rate = end_statistics.max_error_rate
    if end_statistics.allows_partial_matches:
        body = "\n" + str(ErrorRanges(length, error_rate))
    else:
        body = f" {int(error_rate * length)}"
    return "No. of allowed errors:" + body + "\n"


# --- histograms --------------------------------------------------------------


@dataclass
class HistogramRow:
    """One row in the 'trimmed lengths' histogram."""

    length: int
    count: int
    expect: float
    max_err: int
    error_counts: List[int]


def histogram_rows(
    end_statistics: EndStatistics,
    n: int,
    gc_content: float,
) -> Iterator[HistogramRow]:
    """Yield histogram rows. n -- total number of reads."""
    lengths = end_statistics.lengths
    errors = end_statistics.errors
    random_chance = end_statistics.random_match_probabilities(
        gc_content=gc_content
    )
    adapter_length = len(end_statistics.sequence)
    for length in sorted(lengths):
        # beyond the adapter length the chance stops increasing
        expect = n * random_chance[min(adapter_length, length)]
        worst = max(errors[length].keys())
        yield HistogramRow(
            length=length,
            count=lengths[length],
            expect=expect,
            max_err=int(
                end_statistics.max_error_rate
                * min(length, end_statistics.effective_length)
            ),
            error_counts=[errors[length][e] for e in range(worst + 1)],
        )


def histogram(end_statistics: EndStatistics, n: int, gc_content: float) -> str:
    """
    Formatted histogram of trimmed lengths, including the number of
    reads expected to be trimmed by chance.
    """
    sio = StringIO()
    print("length", "count", "expect", "max.err", "error counts", sep="\t",
          file=sio)
    for row in histogram_rows(end_statistics, n, gc_content):
        print(
            row.length,
            row.count,
            f"{row.expect:.1F}",
            row.max_err,
            " ".join(str(e) for e in row.error_counts),
            sep="\t",
            file=sio,
        )
    return sio.getvalue() + "\n"


class AdjacentBaseStatistics:
    """Distribution of the base preceding removed 3' adapters; warns
    when one base dominates (likely incomplete adapter sequence)."""

    def __init__(self, bases: Dict[str, int]):
        self.bases: Dict[str, int] = bases
        self._warnbase: Optional[str] = None
        total = sum(self.bases.values())
        if total == 0:
            self._fractions = None
            return
        self._fractions = []
        for base in ("A", "C", "G", "T", ""):
            label = base if base != "" else "none/other"
            fraction = self.bases[base] / total
            self._fractions.append((label, fraction))
            if fraction > 0.8 and base != "":
                self._warnbase = label
        if total < 20:
            self._warnbase = None

    def __repr__(self):
        return f"AdjacentBaseStatistics(bases={self.bases})"

    @property
    def should_warn(self) -> bool:
        return self._warnbase is not None

    @property
    def warnbase(self) -> Optional[str]:
        return self._warnbase

    def __str__(self) -> str:
        if not self._fractions:
            return ""
        sio = StringIO()
        print("Bases preceding removed adapters:", file=sio)
        for label, fraction in self._fractions:
            print(f"  {label}: {fraction:.1%}", file=sio)
        if self.should_warn:
            print("WARNING:", file=sio)
            print(
                f"    The adapter is preceded by '{self._warnbase}' "
                "extremely often.",
                file=sio,
            )
            print(
                "    The provided adapter sequence could be incomplete at "
                "its 5' end.",
                file=sio,
            )
            print("    Ignore this warning when trimming primers.", file=sio)
        return sio.getvalue()

    def as_json(self) -> Optional[Dict[str, int]]:
        if not self._fractions:
            return None
        return {b: self.bases.get(b, 0) for b in ["A", "C", "G", "T", ""]}


# --- text reports ------------------------------------------------------------


def _summary_block(stats: Statistics) -> str:
    """The '=== Summary ===' block (counts, fate breakdown, bp totals)."""
    report = "\n=== Summary ===\n\n"
    if stats.paired:
        report += f"Total read pairs processed:      {stats.n:13,d}\n"
        for i in (0, 1):
            if stats.with_adapters[i] is not None:
                report += (
                    f"  Read {i+1} with adapter:           "
                    f"{stats.with_adapters[i]:13,d} "
                    f"({stats.with_adapters_fraction[i]:.1%})\n"
                )
    else:
        report += f"Total reads processed:           {stats.n:13,d}\n"
        if stats.with_adapters[0] is not None:
            report += (
                f"Reads with adapters:             "
                f"{stats.with_adapters[0]:13,d} "
                f"({stats.with_adapters_fraction[0]:.1%})\n"
            )

    if stats.reverse_complemented is not None:
        report += (
            "Reverse-complemented:            "
            "{o.reverse_complemented:13,d} ({o.reverse_complemented_fraction:.1%})\n"
        )

    filter_report = format_filter_report(stats)
    if filter_report:
        report += "\n== Read fate breakdown ==\n"
        report += filter_report

    report += textwrap.dedent(
        """\
    {pairs_or_reads} written (passing filters): {o.written:13,d} ({o.written_fraction:.1%})

    Total basepairs processed: {o.total:13,d} bp
    """
    )
    if stats.paired:
        report += "  Read 1: {o.total_bp[0]:13,d} bp\n"
        report += "  Read 2: {o.total_bp[1]:13,d} bp\n"

    if stats.quality_trimmed is not None:
        report += (
            "Quality-trimmed:           "
            f"{stats.quality_trimmed:13,d} bp "
            f"({stats.quality_trimmed_fraction:.1%})\n"
        )
        if stats.paired:
            for i in (0, 1):
                if stats.quality_trimmed_bp[i] is not None:
                    report += (
                        f"  Read {i + 1}: {stats.quality_trimmed_bp[i]:13,d} bp\n"
                    )

    if stats.poly_a_trimmed is not None:
        report += (
            "Poly-A-trimmed:            "
            f"{stats.poly_a_trimmed:13,d} bp ({stats.poly_a_trimmed_fraction:.1%})\n"
        )
        if stats.paired:
            for i in (0, 1):
                if stats.poly_a_trimmed_bp[i] is not None:
                    report += (
                        f"  Read {i + 1}: {stats.poly_a_trimmed_bp[i]:13,d} bp\n"
                    )

    report += (
        "Total written (filtered):  "
        "{o.total_written_bp:13,d} bp ({o.total_written_bp_fraction:.1%})\n"
    )
    if stats.paired:
        report += "  Read 1: {o.written_bp[0]:13,d} bp\n"
        report += "  Read 2: {o.written_bp[1]:13,d} bp\n"
    pairs_or_reads = "Pairs" if stats.paired else "Reads"
    return report.format(o=stats, pairs_or_reads=pairs_or_reads)


def _adapter_header_line(
    adapter_statistics: AdapterStatistics, total_front, total_back, total
) -> str:
    """The 'Sequence: ...; Type: ...' line (without rc suffix)."""
    adapter = adapter_statistics.adapter
    if adapter_statistics.kind == "linked":
        front_seq = adapter_statistics.front.sequence
        back_seq = adapter_statistics.back.sequence
        return (
            f"Sequence: {front_seq}...{back_seq}; Type: linked; "
            f"Length: {len(front_seq)}+{len(back_seq)}; "
            f"5' trimmed: {total_front} times; "
            f"3' trimmed: {total_back} times"
        )
    assert isinstance(adapter, (SingleAdapter, AnywhereAdapter))
    return (
        f"Sequence: {adapter.sequence}; Type: {adapter.description}; "
        f"Length: {len(adapter.sequence)}; Trimmed: {total} times"
    )


def _adapter_detail_section(
    print_s, stats, adapter_statistics, total_front, total_back, gc_content
) -> bool:
    """Per-kind detail block; returns whether an incomplete-adapter
    warning was triggered."""
    adapter = adapter_statistics.adapter
    kind = adapter_statistics.kind
    n = stats.n
    if kind == "both":
        assert isinstance(adapter, AnywhereAdapter)
        print_s(total_front, "times, it overlapped the 5' end of a read")
        print_s(
            total_back,
            "times, it overlapped the 3' end or was within the read",
        )
        print_s()
        print_s("Minimum overlap:", adapter.min_overlap)
        print_s(error_ranges(adapter_statistics.front))
        print_s("Overview of removed sequences (5')")
        print_s(histogram(adapter_statistics.front, n, gc_content))
        print_s()
        print_s("Overview of removed sequences (3' or within)")
        print_s(histogram(adapter_statistics.back, n, gc_content))
        return False
    if kind == "linked":
        assert isinstance(adapter, LinkedAdapter)
        print_s()
        print_s(
            f"Minimum overlap: "
            f"{adapter.front_adapter.min_overlap}"
            f"+{adapter.back_adapter.min_overlap}"
        )
        print_s(error_ranges(adapter_statistics.front))
        print_s(error_ranges(adapter_statistics.back))
        print_s("Overview of removed sequences at 5' end")
        print_s(histogram(adapter_statistics.front, n, gc_content))
        print_s()
        print_s("Overview of removed sequences at 3' end")
        print_s(histogram(adapter_statistics.back, n, gc_content))
        return False
    if kind == "front":
        assert isinstance(adapter, FrontAdapter)
        print_s()
        if adapter.allows_partial_matches:
            print_s("Minimum overlap:", adapter.min_overlap)
        print_s(error_ranges(adapter_statistics.end))
        print_s("Overview of removed sequences")
        print_s(histogram(adapter_statistics.end, n, gc_content))
        return False
    assert kind == "back"
    assert isinstance(adapter, BackAdapter)
    print_s()
    if adapter.allows_partial_matches:
        print_s("Minimum overlap:", adapter.min_overlap)
    print_s(error_ranges(adapter_statistics.end))
    base_stats = AdjacentBaseStatistics(adapter_statistics.end.adjacent_bases)
    print_s(base_stats)
    print_s("Overview of removed sequences")
    print_s(histogram(adapter_statistics.end, n, gc_content))
    return base_stats.should_warn


def full_report(stats: Statistics, time: float, gc_content: float) -> str:
    """Render the full human-readable report."""
    if stats.n == 0:
        return "No reads processed!"
    sio = StringIO()

    def print_s(*args, **kwargs):
        kwargs["file"] = sio
        print(*args, **kwargs)

    print_s(_summary_block(stats))

    warning = False
    for which_in_pair in (0, 1):
        for adapter_statistics in stats.adapter_stats[which_in_pair]:
            front_end, back_end = adapter_statistics.end_statistics()
            total_front = (
                sum(front_end.lengths.values()) if front_end is not None else 0
            )
            total_back = (
                sum(back_end.lengths.values()) if back_end is not None else 0
            )
            total = total_front + total_back
            adapter = adapter_statistics.adapter
            if isinstance(adapter, BackAdapter):
                assert total_front == 0
            if isinstance(adapter, FrontAdapter):
                assert total_back == 0

            if stats.paired:
                extra = "First read: " if which_in_pair == 0 else "Second read: "
            else:
                extra = ""
            print_s("=" * 3, extra + "Adapter", adapter_statistics.name, "=" * 3)
            print_s()
            print_s(
                _adapter_header_line(
                    adapter_statistics, total_front, total_back, total
                ),
                end="",
            )
            if stats.reverse_complemented is not None:
                print_s(
                    f"; Reverse-complemented: "
                    f"{adapter_statistics.reverse_complemented} times"
                )
            else:
                print_s()
            if total == 0:
                print_s()
                continue
            warned = _adapter_detail_section(
                print_s, stats, adapter_statistics, total_front, total_back,
                gc_content,
            )
            warning = warning or warned

        poly_a = stats.poly_a_trimmed_lengths[which_in_pair]
        if poly_a is not None:
            print_s(poly_a_report(poly_a, which_in_pair if stats.paired else None))

    if warning:
        print_s("WARNING:")
        print_s("    One or more of your adapter sequences may be incomplete.")
        print_s("    Please see the detailed output above.")

    return sio.getvalue().rstrip()


def poly_a_report(poly_a: Mapping[int, int], which_in_pair: Optional[int]) -> str:
    titles = {None: "Poly-A", 0: "R1 poly-A", 1: "R2 poly-A"}
    sio = StringIO()
    print(f"=== {titles[which_in_pair]} trimmed ===", file=sio)
    print(file=sio)
    print("length", "count", sep="\t", file=sio)
    for length in sorted(poly_a):
        print(length, poly_a[length], sep="\t", file=sio)
    return sio.getvalue() + "\n"


def format_filter_report(stats):
    report = ""
    for name, description in FILTERS.items():
        if name not in stats.filtered:
            continue
        value = stats.filtered[name]
        fraction = stats.filtered_fraction(name)
        report += (
            "{pairs_or_reads} "
            + (description + ":").ljust(27)
            + f"{value:13,d} ({fraction:.1%})\n"
        )
    return report


def minimal_report(stats: Statistics, time: float, gc_content: float) -> str:
    """Create a minimal tabular report suitable for concatenation."""
    del time, gc_content

    header = [
        "status",
        "in_reads",
        "in_bp",
        "too_short",
        "too_long",
        "too_many_n",
        "out_reads",
        "w/adapters",
        "qualtrim_bp",
        "out_bp",
    ]
    written_bp = stats.read_length_statistics.written_bp()
    fields: List[Any] = [
        "OK",
        stats.n,
        stats.total,
        stats.filtered.get("too_short", 0),
        stats.filtered.get("too_long", 0),
        stats.filtered.get("too_many_n", 0),
        stats.read_length_statistics.written_reads(),
        stats.with_adapters[0] or 0,
        stats.quality_trimmed_bp[0] or 0,
        written_bp[0],
    ]
    if stats.paired:
        header += ["w/adapters2", "qualtrim2_bp", "out2_bp"]
        fields += [
            stats.with_adapters[1] or 0,
            stats.quality_trimmed_bp[1] or 0,
            written_bp[1],
        ]

    for side_stats in stats.adapter_stats[0] + stats.adapter_stats[1]:
        if side_stats.kind == "back" and AdjacentBaseStatistics(
            side_stats.end.adjacent_bases
        ).should_warn:
            fields[0] = "WARN"
            break
    return "\t".join(header) + "\n" + "\t".join(str(x) for x in fields)
