from typing import Sequence

from cutadapt_tpu.io import SequenceRecord
from cutadapt_tpu.adapters import (
    BackAdapter,
    AnywhereAdapter,
    Adapter,
)
from cutadapt_tpu.modifiers import AdapterCutter, ModificationInfo


def test_statistics() -> None:
    read = SequenceRecord("name", "AAAACCCCAAAA")
    adapters: Sequence[Adapter] = [BackAdapter("CCCC", max_errors=0.1)]
    cutter = AdapterCutter(adapters, times=3)
    cutter(read, ModificationInfo(read))
    assert cutter.adapter_statistics[adapters[0]].kind == "back"
    lengths = cutter.adapter_statistics[adapters[0]].end.lengths
    trimmed_bp = sum(seqlen * count for (seqlen, count) in lengths.items())
    assert trimmed_bp <= len(read), trimmed_bp


def test_end_trim_with_mismatch():
    """
    An adapter of length 13 trimmed from the end with overlap 9 and one
    deletion: the hit starts from 10 adapter bases so the match counts;
    an insertion or substitution at the same spot does not.
    """
    adapter = BackAdapter("TCGATCGATCGAT", max_errors=0.1)

    read = SequenceRecord("foo1", "AAAAAAAAAAATCGTCGATC")
    cutter = AdapterCutter([adapter], times=1)
    trimmed_read = cutter(read, ModificationInfo(read))

    assert trimmed_read.sequence == "AAAAAAAAAAA"
    assert cutter.adapter_statistics[adapter].end.lengths == {9: 1}
    # One error recorded at length 9 even though zero mismatches are
    # allowed at that length.
    assert cutter.adapter_statistics[adapter].end.errors[9][1] == 1

    read = SequenceRecord("foo2", "AAAAAAAAAAATCGAACGA")
    cutter = AdapterCutter([adapter], times=1)
    trimmed_read = cutter(read, ModificationInfo(read))

    assert trimmed_read.sequence == read.sequence
    assert cutter.adapter_statistics[adapter].end.lengths == {}


def test_anywhere_with_errors():
    adapter = AnywhereAdapter("CCGCATTTAG", max_errors=0.1)
    for seq, expected_trimmed in (
        ("AACCGGTTccgcatttagGATC", "AACCGGTT"),
        ("AACCGGTTccgcgtttagGATC", "AACCGGTT"),  # one mismatch
        ("AACCGGTTccgcatttag", "AACCGGTT"),
        ("ccgcatttagAACCGGTT", "AACCGGTT"),
        ("ccgtatttagAACCGGTT", "AACCGGTT"),  # one mismatch
        ("ccgatttagAACCGGTT", "AACCGGTT"),  # one deletion
    ):
        read = SequenceRecord("foo", seq)
        cutter = AdapterCutter([adapter], times=1)
        trimmed_read = cutter(read, ModificationInfo(read))
        assert trimmed_read.sequence == expected_trimmed
