"""
K-mer prefilter construction (pigeonhole principle).

If an adapter may match with at most e errors, then when it is split
into e+1 chunks, at least one chunk must occur exactly. For 3'/5'
adapters that may also partially overlap the read end, position-bounded
search sets with fewer allowed errors are generated for each
error-count breakpoint.

Same algorithm family as the reference's heuristic
(/root/reference/src/cutadapt/kmer_heuristic.py:6-164).
"""

import io
from collections import defaultdict
from typing import List, Optional, Set, Tuple


def kmer_chunks(sequence: str, chunks: int) -> Set[str]:
    """Partition a sequence into `chunks` nearly equal pieces."""
    chunk_size = len(sequence) // chunks
    remainder = len(sequence) % chunks
    chunk_sizes: List[int] = remainder * [chunk_size + 1] + (
        chunks - remainder
    ) * [chunk_size]
    offset = 0
    chunk_set = set()
    for size in chunk_sizes:
        chunk_set.add(sequence[offset : offset + size])
        offset += size
    return chunk_set


# A SearchSet is (start, stop, kmer-set); negative start counts from the
# sequence end, stop None means "to the end".
SearchSet = Tuple[int, Optional[int], Set[str]]


def minimize_kmer_search_list(
    kmer_search_list: List[Tuple[str, int, Optional[int]]],
) -> List[Tuple[str, int, Optional[int]]]:
    kmer_and_offsets_dict = defaultdict(list)
    for kmer, start, stop in kmer_search_list:
        kmer_and_offsets_dict[kmer].append((start, stop))
    kmers_and_positions: List[Tuple[str, int, Optional[int]]] = []
    for kmer, positions in kmer_and_offsets_dict.items():
        if len(positions) == 1:
            start, stop = positions[0]
            kmers_and_positions.append((kmer, start, stop))
            continue
        if (0, None) in positions:
            kmers_and_positions.append((kmer, 0, None))
            continue
        front_searches = [(start, stop) for start, stop in positions if start == 0]
        back_searches = [(start, stop) for start, stop in positions if stop is None]
        middle_searches = [
            (start, stop)
            for start, stop in positions
            if start != 0 and stop is not None
        ]
        if middle_searches:
            raise NotImplementedError(
                "Situations with searches starting in the middle have not "
                "been considered."
            )
        if front_searches:
            # (0, None) was already handled, so stop is never None here.
            kmers_and_positions.append(
                (kmer, 0, max(stop for _, stop in front_searches))  # type: ignore
            )
        if back_searches:
            kmers_and_positions.append(
                (kmer, min(start for start, _ in back_searches), None)
            )
    return kmers_and_positions


def remove_redundant_kmers(
    search_sets: List[SearchSet],
) -> List[Tuple[int, Optional[int], List[str]]]:
    """
    Merge k-mers occurring in multiple search sets so each is searched
    once in the largest applicable window (fewer false positives).
    """
    kmer_search_list = []
    for start, stop, kmer_set in search_sets:
        for kmer in kmer_set:
            kmer_search_list.append((kmer, start, stop))
    minimized_search_list = minimize_kmer_search_list(kmer_search_list)
    result_dict = defaultdict(list)
    for kmer, start, stop in minimized_search_list:
        result_dict[(start, stop)].append(kmer)
    return [(start, stop, kmers) for (start, stop), kmers in result_dict.items()]


def create_back_overlap_searchsets(
    adapter: str, min_overlap: int, error_rate: float
) -> List[SearchSet]:
    adapter_length = len(adapter)
    error_lengths = []
    max_error = 0
    search_sets: List[SearchSet] = []
    for i in range(adapter_length + 1):
        if int(i * error_rate) > max_error:
            error_lengths.append((max_error, i - 1))
            max_error += 1
    error_lengths.append((max_error, adapter_length))

    minimum_length = min_overlap
    for max_errors, length in error_lengths:
        if minimum_length > length:
            continue
        if max_errors == 0:
            # Short 1-4-mer anchors near the read end: the probability
            # of false positives is too high when evaluated in a larger
            # window.
            min_overlap_kmer_length = 5
            if minimum_length < min_overlap_kmer_length:
                for i in range(minimum_length, min_overlap_kmer_length):
                    search_set = (-i, None, {adapter[:i]})
                    search_sets.append(search_set)
                minimum_length = min_overlap_kmer_length
        kmer_sets = kmer_chunks(adapter[:minimum_length], max_errors + 1)
        search_sets.append((-length, None, kmer_sets))
        minimum_length = length + 1
    return search_sets


def create_positions_and_kmers(
    adapter: str,
    min_overlap: int,
    error_rate: float,
    back_adapter: bool,
    front_adapter: bool,
    internal: bool = True,
) -> List[Tuple[int, Optional[int], List[str]]]:
    """
    Build the (start, stop, kmers) combinations where at least one kmer
    must occur for an alignment to be possible, so reads without any
    hit can skip alignment entirely.
    """
    max_errors = int(len(adapter) * error_rate)
    search_sets = []
    if back_adapter:
        search_sets.extend(
            create_back_overlap_searchsets(adapter, min_overlap, error_rate)
        )
    if front_adapter:
        # Reuse the back-overlap construction on the reversed adapter
        # and mirror the coordinates.
        reversed_back_search_sets = create_back_overlap_searchsets(
            adapter[::-1], min_overlap, error_rate
        )
        front_search_sets = []
        for start, stop, kmer_set in reversed_back_search_sets:
            new_kmer_set = {kmer[::-1] for kmer in kmer_set}
            front_search_sets.append((0, -start, new_kmer_set))
        search_sets.extend(front_search_sets)
    if internal:
        kmer_sets = kmer_chunks(adapter, max_errors + 1)
        search_sets.append((0, None, kmer_sets))
    return remove_redundant_kmers(search_sets)


def kmer_probability_analysis(
    kmers_and_offsets: List[Tuple[int, Optional[int], List[str]]],
    default_length: int = 150,
) -> str:  # pragma: no cover  # debugging aid
    """Tab-separated table of hit chances per kmer on random sequence."""
    out = io.StringIO()
    out.write(
        "kmer\tstart\tstop\tconsidered sites\thit chance by random sequence (%)\n"
    )
    accumulated_not_hit_chance = 1.0
    for start, stop, kmers in kmers_and_offsets:
        if stop is None:
            check_length = -start if start < 0 else default_length - start
        else:
            start = default_length - start if start < 0 else start
            check_length = max(stop - start, 0)
        for kmer in kmers:
            kmer_length = len(kmer)
            considered_sites = check_length - kmer_length + 1
            single_kmer_hit_chance = 1 / 4**kmer_length
            not_hit_chance = (1 - single_kmer_hit_chance) ** considered_sites
            accumulated_not_hit_chance *= not_hit_chance
            out.write(
                f"{kmer:10}\t{start}\t{stop}\t{considered_sites}"
                f"\t{(1 - not_hit_chance) * 100:.2f}\n"
            )
    out.write(
        "Chance for profile hit by random sequence: "
        f"{(1 - accumulated_not_hit_chance) * 100:.2f}%\n"
    )
    return out.getvalue()
