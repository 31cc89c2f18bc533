"""
Golden-file end-to-end tests of the single-end CLI.

Each case runs the CLI in-process over an input from tests/data/ and
byte-compares the output against the expected file in tests/cut/
(the output-parity contract with the reference engine).
"""

import os
import subprocess
import sys
from io import BytesIO, StringIO

import pytest

from utils import assert_files_equal, cutpath, datapath

from cutadapt_tpu.cli import main
from cutadapt_tpu.io import open_sequence_file

# (id, params, expected, input)
GOLDEN_CASES = [
    ("example", "-N -b ADAPTER", "example.fa", "example.fa"),
    ("small", "-a TTAGACATATCTCCGTCG", "small.fastq", "small.fastq"),
    ("newlines", "-e 0.12 -a TTAGACATATCTCCGTCG", "dos.fastq", "dos.fastq"),
    ("lowercase", "-a ttagacatatctccgtcg", "lowercase.fastq", "small.fastq"),
    ("discard", "-b TTAGACATATCTCCGTCG --discard", "discard.fastq", "small.fastq"),
    (
        "discard_untrimmed",
        "-b CAAGAT --discard-untrimmed",
        "discard-untrimmed.fastq",
        "small.fastq",
    ),
    ("maximum_length", "-M 5 -a TTAGACATATCTCCGTCG", "maxlen.fa", "lengths.fa"),
    (
        "length_tag",
        "-n 3 -e 0.1 --length-tag length= "
        "-b TGAGACACGCAACAGGGGAAAGGCAAGGCACACAGGGGATAGG "
        "-b TCCATCTCATCCCTGCGTGTCCCATCTGTTCCCTCCCTGTCTCA",
        "454.fa",
        "454.fa",
    ),
    ("overlap_b", "-O 10 -b TTAGACATATCTCCGTCG", "overlapb.fa", "overlapb.fa"),
    ("trim_n", "--trim-n", "trim-n.fasta", "trim-n.fasta"),
    ("qualtrim", "-q 10 -a XXXXXX", "lowqual.fastq", "lowqual.fastq"),
    (
        "qualbase",
        "-q 10 --quality-base 64 -a XXXXXX",
        "illumina64.fastq",
        "illumina64.fastq",
    ),
    (
        "quality_trim_only",
        "-q 10 --quality-base 64",
        "illumina64.fastq",
        "illumina64.fastq",
    ),
    (
        "twoadapters",
        "-a AATTTCAGGAATT -a GTTCTCTAGTTCT",
        "twoadapters.fasta",
        "twoadapters.fasta",
    ),
    (
        "polya_legacy",
        "-O 10 -a AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA",
        "polya.legacy.1.fasta",
        "polya.1.fasta",
    ),
    ("polya_legacy_braces", "-O 10 -a A{35}", "polya.legacy.1.fasta", "polya.1.fasta"),
    ("polya", "--poly-a", "polya.1.fasta", "polya.1.fasta"),
    (
        "no_trim",
        "--no-trim --discard-untrimmed -a CCCTAGTTAAAC",
        "no-trim.fastq",
        "small.fastq",
    ),
    (
        "action_none",
        "--action=none --discard-untrimmed -a CCCTAGTTAAAC",
        "no-trim.fastq",
        "small.fastq",
    ),
    (
        "mask_adapter",
        "-b CAAG -n 3 --mask-adapter",
        "anywhere_repeat.fastq",
        "anywhere_repeat.fastq",
    ),
    (
        "action_mask",
        "-b CAAG -n 3 --action=mask",
        "anywhere_repeat.fastq",
        "anywhere_repeat.fastq",
    ),
    (
        "action_lowercase",
        "-b CAAG -n 3 --action=lowercase",
        "action_lowercase.fasta",
        "action_lowercase.fasta",
    ),
    (
        "action_retain",
        "-g GGTTAACC -a CAAG --action=retain",
        "action_retain.fasta",
        "action_retain.fasta",
    ),
    (
        "action_crop",
        "-g GGTTAA -a CAAG --action=crop --discard-untrimmed",
        "action_crop.fasta",
        "action_retain.fasta",
    ),
    (
        "read_wildcard",
        "--match-read-wildcards -b ACGTACGT",
        "wildcard.fa",
        "wildcard.fa",
    ),
    (
        "wildcard_N",
        "-e 0 -a GGGGGGG --match-read-wildcards",
        "wildcardN.fa",
        "wildcardN.fa",
    ),
    (
        "illumina_adapter_wildcard",
        "-a VCCGAMCYUCKHRKDCUBBCNUWNSGHCGU",
        "illumina.fastq",
        "illumina.fastq.gz",
    ),
    ("adapter_front", "--front ADAPTER -N", "examplefront.fa", "example.fa"),
    ("literal_N", "-N -e 0.2 -a NNNNNNNNNNNNNN", "trimN3.fasta", "trimN3.fasta"),
    ("literal_N2", "-N -O 1 -g NNNNNNNNNNNNNN", "trimN5.fasta", "trimN5.fasta"),
    ("literal_N_braces", "-N -e 0.2 -a N{14}", "trimN3.fasta", "trimN3.fasta"),
    ("literal_N2_braces", "-N -O 1 -g N{14}", "trimN5.fasta", "trimN5.fasta"),
    ("anchored_front", "-g ^FRONTADAPT -N", "anchored.fasta", "anchored.fasta"),
    (
        "anchored_front_ellipsis",
        "-a ^FRONTADAPT... -N",
        "anchored.fasta",
        "anchored.fasta",
    ),
    ("anchored_back", "-a BACKADAPTER$ -N", "anchored-back.fasta", "anchored-back.fasta"),
    (
        "anchored_back_ellipsis",
        "-a ...BACKADAPTER$ -N",
        "anchored-back.fasta",
        "anchored-back.fasta",
    ),
    (
        "anchored_back_no_indels",
        "-a BACKADAPTER$ -N --no-indels",
        "anchored-back.fasta",
        "anchored-back.fasta",
    ),
    (
        "no_indels",
        "-a TTAGACATAT -g GAGATTGCCA --no-indels",
        "no_indels.fasta",
        "no_indels.fasta",
    ),
    (
        "ellipsis_notation",
        "-a ...TTAGACATAT -g GAGATTGCCA --no-indels",
        "no_indels.fasta",
        "no_indels.fasta",
    ),
    (
        "strip_suffix",
        "--strip-suffix _sequence -a XXXXXXX",
        "stripped.fasta",
        "simple.fasta",
    ),
    (
        "named_adapter",
        "-a MY_ADAPTER=GCCGAACTTCTTAGACTGCCTTAAGGACGT",
        "illumina.fastq",
        "illumina.fastq.gz",
    ),
    (
        "adapter_with_u",
        "-a GCCGAACUUCUUAGACUGCCUUAAGGACGU",
        "illumina.fastq",
        "illumina.fastq.gz",
    ),
    (
        "anchored_no_indels",
        "-g ^TTAGACATAT --no-indels -e 0.1",
        "anchored_no_indels.fasta",
        "anchored_no_indels.fasta",
    ),
    (
        "anchored_no_indels_wildcard_read",
        "-g ^TTAGACATAT --match-read-wildcards --no-indels -e 0.1",
        "anchored_no_indels_wildcard.fasta",
        "anchored_no_indels.fasta",
    ),
    (
        "anchored_no_indels_wildcard_adapt",
        "-g ^TTAGACANAT --no-indels -e 0.12",
        "anchored_no_indels.fasta",
        "anchored_no_indels.fasta",
    ),
    ("cut_front", "-u 5", "unconditional-front.fastq", "small.fastq"),
    ("cut_back", "-u -5", "unconditional-back.fastq", "small.fastq"),
    ("cut_both", "-u -5 -u 5", "unconditional-both.fastq", "small.fastq"),
    (
        "multiple_fake_anchored",
        "-g ^CGTCCGAAGTAGC -g ^ATTGCCCTAG "
        "-a TTCCATGCAGCATT$ -a CCAGTCCCCCC$ "
        "-a GCCGAACTTCTTAGACTGCCTTAAGGACGT",
        "illumina.fastq",
        "illumina.fastq.gz",
    ),
    (
        "multiple_prefix",
        "-g ^GTACGGATTGTTCAGTA -g ^TATTAAGCTCATTC",
        "multiprefix.fasta",
        "multi.fasta",
    ),
    (
        "multiple_prefix_noindels",
        "--no-indels -g ^GTACGGATTGTTCAGTA -g ^TATTAAGCTCATTC",
        "multiprefix.fasta",
        "multi.fasta",
    ),
    (
        "multiple_suffix_noindels",
        "--no-indels -a CGTGATTATCTTGC$ -a CCTATTAGTGGTTGAAC$",
        "multisuffix.fasta",
        "multi.fasta",
    ),
    ("nextseq", "--nextseq-trim 22", "nextseq.fastq", "nextseq.fastq"),
    (
        "linked_anchored",
        "-a ^AAAAAAAAAA...TTTTTTTTTT",
        "linked.fasta",
        "linked.fasta",
    ),
    (
        "linked_multiple",
        "-a ^AAAAAAAAAA...TTTTTTTTTT -a ^AAAAAAAAAA...GCGCGCGCGC",
        "linked.fasta",
        "linked.fasta",
    ),
    (
        "linked_both_anchored",
        "-a ^AAAAAAAAAA...TTTTT$",
        "linked-anchored.fasta",
        "linked.fasta",
    ),
    (
        "linked_5p_not_anchored",
        "-g AAAAAAAAAA...TTTTTTTTTT",
        "linked-not-anchored.fasta",
        "linked.fasta",
    ),
    (
        "linked_discard_untrimmed",
        "-a ^AAAAAAAAAA...TTTTTTTTTT --discard-untrimmed",
        "linked-discard.fasta",
        "linked.fasta",
    ),
    (
        "linked_discard_untrimmed_g",
        "-g AAAAAAAAAA...TTTTTTTTTT --discard-untrimmed",
        "linked-discard-g.fasta",
        "linked.fasta",
    ),
    (
        "linked_lowercase",
        "-a ^AACCGGTTTT...GGGGGGG$ -a ^AAAA...TTTT$ --times=2 --action=lowercase",
        "linked-lowercase.fasta",
        "linked.fasta",
    ),
    ("fasta_no_trim", [], "small-no-trim.fasta", "small.fastq"),
    ("length", "--length 5", "shortened.fastq", "small.fastq"),
    ("negative_length", "--length -5", "shortened-negative.fastq", "small.fastq"),
    ("xadapter", "-g XTCCGAATAGA", "xadapter.fasta", "xadapterx.fasta"),
    ("adapterx", "-a TCCGAATAGAX", "adapterx.fasta", "xadapterx.fasta"),
    (
        "minimal_report",
        "-b TTAGACATATCTCCGTCG --report=minimal",
        "small.fastq",
        "small.fastq",
    ),
    ("paired_separate_1", "-a TTAGACATAT", "paired-separate.1.fastq", "paired.1.fastq"),
    ("paired_separate_2", "-a CAGTGGAGTA", "paired-separate.2.fastq", "paired.2.fastq"),
    ("empty_wildcard", "-g CWC", "empty.fastq", "empty.fastq"),
    (
        "adapter_order_ga",
        "-g ^AAACC -a CCGGG",
        "adapterorder-ga.fasta",
        "adapterorder.fasta",
    ),
    (
        "adapter_order_ag",
        "-a CCGGG -g ^AAACC",
        "adapterorder-ag.fasta",
        "adapterorder.fasta",
    ),
]


@pytest.mark.parametrize(
    "params,expected,inpath",
    [case[1:] for case in GOLDEN_CASES],
    ids=[case[0] for case in GOLDEN_CASES],
)
def test_golden(run, params, expected, inpath):
    run(params, expected, inpath)


def test_does_not_close_stdout():
    main([datapath("small.fastq")])
    assert not sys.stdout.closed


def test_help():
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.args[0] == 0


def test_unknown_file_format(tmp_path, cores):
    path = tmp_path / "unknown_format.txt"
    path.write_text("raw text")
    with pytest.raises(SystemExit):
        main([f"--cores={cores}", path])


def test_cores_negative():
    with pytest.raises(SystemExit) as e:
        main(["--cores=-1", datapath("simple.fasta")])
    assert e.value.args[0] == 2


def test_quiet_and_report():
    with pytest.raises(SystemExit) as e:
        main(["--quiet", "--report=minimal", datapath("simple.fasta")])
    assert e.value.args[0] == 2


@pytest.mark.parametrize(
    "args",
    [
        ("--discard-trimmed", "--discard-untrimmed"),
        ("--discard-trimmed", "--untrimmed-output", os.devnull),
        ("--discard-untrimmed", "--untrimmed-output", os.devnull),
    ],
)
def test_only_one_of_discard_options(args):
    with pytest.raises(SystemExit) as e:
        main(["-o", os.devnull, *args, datapath("small.fastq")])
    assert e.value.args[0] == 2


def test_debug():
    main(["--debug", "--", datapath("small.fastq")])


def test_debug_trace():
    main(["--debug", "--debug", "-a", "ACGT", datapath("small.fastq")])


def test_small_bam(run, cores):
    run(
        "--cores {} -a TTAGACATATCTCCGTCG".format(cores),
        "small_from_bam.fastq",
        "small.bam",
    )


def test_empty_fastq(run, cores):
    run("--cores {} -a TTAGACATATCTCCGTCG".format(cores), "empty.fastq", "empty.fastq")


def test_empty_fasta_input(run, cores):
    run(["--cores", str(cores)], "empty.fasta", "empty.fasta")


def test_no_read_only_comment_fasta_input(run, cores):
    run(["--cores", str(cores)], "empty.fasta", "onlycomment.fasta")


def test_rest(run, tmp_path, cores):
    rest = tmp_path / "rest.tmp"
    run(
        ["--cores", str(cores), "-b", "ADAPTER", "-N", "-r", rest], "rest.fa", "rest.fa"
    )
    assert_files_equal(datapath("rest.txt"), rest)


def test_restfront(run, tmp_path):
    path = tmp_path / "rest.txt"
    run(["-g", "ADAPTER", "-N", "-r", path], "restfront.fa", "rest.fa")
    assert_files_equal(datapath("restfront.txt"), path)


def test_minimum_length(run):
    stats = run("-m 5 -a TTAGACATATCTCCGTCG", "minlen.fa", "lengths.fa")
    assert stats.written_bp[0] == 45
    assert stats.written == 6


def test_too_short(run, tmp_path, cores):
    too_short_path = tmp_path / "tooshort.fa"
    stats = run(
        [
            "--cores",
            str(cores),
            "-m",
            "5",
            "-a",
            "TTAGACATATCTCCGTCG",
            "--too-short-output",
            too_short_path,
        ],
        "minlen.fa",
        "lengths.fa",
    )
    assert_files_equal(datapath("tooshort.fa"), too_short_path)
    assert stats.filtered["too_short"] == 5


@pytest.mark.parametrize("redirect", (False, True))
def test_too_short_statistics(redirect):
    args = [
        "-a",
        "TTAGACATATCTCCGTCG",
        "-m",
        "24",
        "-o",
        os.devnull,
        datapath("small.fastq"),
    ]
    if redirect:
        args[:0] = ["--too-short-output", os.devnull]
    stats = main(args)
    assert stats.with_adapters[0] == 2
    assert stats.written == 2
    assert stats.written_bp[0] == 58
    assert stats.filtered["too_short"] == 1


def test_too_long(run, tmp_path, cores):
    too_long_path = tmp_path / "toolong.fa"
    stats = run(
        [
            "--cores",
            str(cores),
            "-M",
            "5",
            "-a",
            "TTAGACATATCTCCGTCG",
            "--too-long-output",
            too_long_path,
        ],
        "maxlen.fa",
        "lengths.fa",
    )
    assert_files_equal(datapath("toolong.fa"), too_long_path)
    assert stats.filtered["too_long"] == 5


@pytest.mark.parametrize("length", list(range(3, 11)))
def test_overlap_a(tmp_path, length):
    """-O/--overlap with -a"""
    adapter = "catatctccg"
    record = ">read\nGAGACCATTCCAATG" + adapter[:length] + "\n"
    input = tmp_path / "overlap.fasta"
    input.write_text(record)
    if length < 7:
        expected = record
    else:
        expected = ">read\nGAGACCATTCCAATG\n"
    output = tmp_path / "overlap-trimmed.fasta"
    main(["-O", "7", "-e", "0", "-a", adapter, "-o", output, input])
    assert expected == output.read_text()


def test_action_retain_times():
    with pytest.raises(SystemExit):
        main(["-a", "ACGT", "--times=2", "--action=retain", datapath("small.fastq")])


@pytest.mark.parametrize(
    "adapter_type,expected",
    [
        ("-a", "wildcard_adapter.fa"),
        ("-b", "wildcard_adapter_anywhere.fa"),
    ],
)
def test_adapter_wildcard(adapter_type, expected, run, tmp_path, cores):
    """wildcards in adapter"""
    wildcard_path = tmp_path / "wildcards.txt"
    run(
        [
            "--cores",
            str(cores),
            "--wildcard-file",
            wildcard_path,
            adapter_type,
            "ACGTNNNACGT",
        ],
        expected,
        "wildcard_adapter.fa",
    )
    with open(wildcard_path) as wct:
        lines = wct.readlines()
    lines = [line.strip() for line in lines]
    assert lines == ["AAA 1", "GGG 2", "CCC 3b", "TTT 4b"]


def test_issue_46(run, tmp_path):
    """IndexError with --wildcard-file"""
    run(
        "--anywhere=AACGTN --wildcard-file={}".format(tmp_path / "wildcards.txt"),
        "issue46.fasta",
        "issue46.fasta",
    )


def test_no_args():
    with pytest.raises(SystemExit):
        main([])


def test_two_fastqs():
    with pytest.raises(SystemExit):
        main([datapath("paired.1.fastq"), datapath("paired.2.fastq")])


def test_non_iupac_characters(run):
    with pytest.raises(SystemExit):
        main(["-a", "ZACGT", datapath("small.fastq")])


def test_unconditional_cut_too_many_commas():
    with pytest.raises(SystemExit):
        main(["-u", "5,7,8", datapath("small.fastq")])


def test_unconditional_cut_invalid_number():
    with pytest.raises(SystemExit):
        main(["-u", "a,b", datapath("small.fastq")])


def test_untrimmed_output(run, cores, tmp_path):
    path = tmp_path / "untrimmed.fastq"
    stats = run(
        ["--cores", str(cores), "-a", "TTAGACATATCTCCGTCG", "--untrimmed-output", path],
        "small.trimmed.fastq",
        "small.fastq",
    )
    assert_files_equal(cutpath("small.untrimmed.fastq"), path)
    assert stats.with_adapters[0] == 2
    assert stats.written == 2
    assert stats.written_bp[0] == 46


def test_adapter_file(run):
    run("-a file:" + datapath("adapter.fasta"), "illumina.fastq", "illumina.fastq.gz")


def test_adapter_file_5p_anchored(run):
    run(
        "-N -g file:" + datapath("prefix-adapter.fasta"),
        "anchored.fasta",
        "anchored.fasta",
    )


def test_adapter_file_3p_anchored(run):
    run(
        "-N -a file:" + datapath("suffix-adapter.fasta"),
        "anchored-back.fasta",
        "anchored-back.fasta",
    )


def test_adapter_file_5p_anchored_no_indels(run):
    run(
        "-N --no-indels -g file:" + datapath("prefix-adapter.fasta"),
        "anchored.fasta",
        "anchored.fasta",
    )


def test_adapter_file_3p_anchored_no_indels(run):
    run(
        "-N --no-indels -a file:" + datapath("suffix-adapter.fasta"),
        "anchored-back.fasta",
        "anchored-back.fasta",
    )


def test_adapter_file_empty_name(run):
    run(
        "-N -a file:" + datapath("adapter-empty-name.fasta"),
        "illumina.fastq",
        "illumina.fastq.gz",
    )


@pytest.mark.parametrize("ext", ["", ".gz"])
def test_demultiplex(cores, tmp_path, ext):
    multiout = str(tmp_path / "tmp-demulti.{name}.fasta") + ext
    params = [
        "--cores",
        str(cores),
        "-a",
        "first=AATTTCAGGAATT",
        "-a",
        "second=GTTCTCTAGTTCT",
        "-o",
        multiout,
        datapath("twoadapters.fasta"),
    ]
    main(params)
    for name in ("first", "second", "unknown"):
        actual = multiout.format(name=name)
        if ext == ".gz":
            subprocess.run(["gzip", "-d", actual], check=True)
            actual = actual[:-3]
        expected = cutpath("twoadapters.{name}.fasta".format(name=name))
        assert_files_equal(expected, actual)


def test_max_n(run):
    assert run("--max-n 0", "maxn0.fasta", "maxn.fasta").filtered["too_many_n"] == 4
    assert run("--max-n 1", "maxn1.fasta", "maxn.fasta").filtered["too_many_n"] == 2
    assert run("--max-n 2", "maxn2.fasta", "maxn.fasta").filtered["too_many_n"] == 1
    assert run("--max-n 0.2", "maxn0.2.fasta", "maxn.fasta").filtered["too_many_n"] == 3
    assert run("--max-n 0.4", "maxn0.4.fasta", "maxn.fasta").filtered["too_many_n"] == 2


def test_quiet_is_quiet():
    captured_standard_output = StringIO()
    captured_standard_error = StringIO()
    setattr(captured_standard_output, "buffer", BytesIO())
    setattr(captured_standard_error, "buffer", BytesIO())
    old_stdout = sys.stdout
    old_stderr = sys.stderr
    try:
        sys.stdout = captured_standard_output
        sys.stderr = captured_standard_error
        main(["-o", os.devnull, "--quiet", datapath("small.fastq")])
    finally:
        sys.stdout = old_stdout
        sys.stderr = old_stderr
    assert captured_standard_output.getvalue() == ""
    assert captured_standard_error.getvalue() == ""
    assert getattr(captured_standard_output, "buffer").getvalue() == b""


def test_x_brace_notation():
    main(["-o", os.devnull, "--quiet", "-a", "X{5}", datapath("small.fastq")])


def test_linked_anywhere():
    with pytest.raises(SystemExit):
        main(["-b", "AAA...TTT", datapath("linked.fasta")])


def test_anywhere_anchored_5p():
    with pytest.raises(SystemExit):
        main(["-b", "^AAA", datapath("small.fastq")])


def test_anywhere_anchored_3p():
    with pytest.raises(SystemExit):
        main(["-b", "TTT$", datapath("small.fastq")])


def test_fastq_input_fasta_output(run, cores):
    run(f"-j {cores} -a TTAGACATATCTCCGTCG", "small.fasta", "small.fastq")


def test_not_rightmost(tmp_path):
    path = tmp_path / "reads.fasta"
    path.write_text(">r\nGGCTGAATTGGACTGAATTGGGT\n")
    trimmed = tmp_path / "trimmed.fasta"
    main(["-g", "CTGAATT", "-o", trimmed, path])
    assert trimmed.read_text() == ">r\nGGACTGAATTGGGT\n"


def test_rightmost(tmp_path):
    path = tmp_path / "reads.fasta"
    path.write_text(">r\nGGCTGAATTGGACTGAATTGGGT\n")
    trimmed = tmp_path / "trimmed.fasta"
    main(["-g", "CTGAATT;rightmost", "-o", trimmed, path])
    assert trimmed.read_text() == ">r\nGGGT\n"


def test_discard_casava(run):
    stats = run("--discard-casava", "casava.fastq", "casava.fastq")
    assert stats.filtered["casava_filtered"] == 1


def test_cores_autodetect(run):
    run("--cores 0 -b TTAGACATATCTCCGTCG", "small.fastq", "small.fastq.gz")


def test_reverse_complement_no_rc_suffix(run, tmp_path):
    out_path = tmp_path / "out.fastq"
    main(
        [
            "-o",
            out_path,
            "--revcomp",
            "--no-index",
            "--rename",
            "{header}",
            "-g",
            "^TTATTTGTCT",
            "-g",
            "^TCCGCACTGG",
            datapath("revcomp.1.fastq"),
        ]
    )
    with open(out_path, "rb") as f:
        reads = list(open_sequence_file(f))
    assert len(reads) == 6
    assert reads[1].name == "read2/1"
    assert reads[1].sequence == "ACCATCCGATATGTCTAATGTGGCCTGTTG"


def test_reverse_complement_normalized(run):
    stats = run(
        "--revcomp --no-index -g ^TTATTTGTCT -g ^TCCGCACTGG",
        "revcomp-single-normalize.fastq",
        "revcomp.1.fastq",
    )
    assert stats.n == 6
    assert stats.reverse_complemented == 2


def test_max_expected_errors(run, cores):
    stats = run("--max-ee=0.9", "maxee.fastq", "maxee.fastq")
    assert stats.filtered["too_many_expected_errors"] == 2


def test_max_expected_errors_fasta(tmp_path):
    path = tmp_path / "input.fasta"
    path.write_text(">read\nACGTACGT\n")
    main(["--max-ee=0.001", "-o", os.devnull, path])


def test_warn_if_en_dashes_used():
    with pytest.raises(SystemExit):
        main(["–q", "25", "-o", os.devnull, "in.fastq"])


@pytest.mark.parametrize("opt", ["-y", "--suffix"])
def test_suffix(opt, run):
    run(
        [opt, " {name}", "-e", "0", "-a", "OnlyT=TTTTTTTT", "-a", "OnlyG=GGGGGGGG"],
        "suffix.fastq",
        "suffix.fastq",
    )


@pytest.mark.parametrize("opt", ["--prefix", "--suffix"])
def test_rename_cannot_be_combined_with_other_renaming_options(opt):
    with pytest.raises(SystemExit):
        main(
            [
                opt,
                "something",
                "--rename='{id} {comment} extrainfo'",
                "-o",
                os.devnull,
                datapath("empty.fastq"),
            ]
        )


def test_duplicate_output_paths(tmp_path):
    path = tmp_path / "discard.fastq"
    with pytest.raises(SystemExit):
        main(
            [
                "--untrimmed-output",
                path,
                "--too-long-output",
                path,
                "-o",
                os.devnull,
                datapath("empty.fastq"),
            ]
        )


def test_rename(run, cores):
    run(
        [
            "--rename={id}_{cut_suffix} {header} {adapter_name}",
            "--cut=-4",
            "-a",
            "OnlyT=TTTTTT",
            "-a",
            "OnlyG=GGGGGG",
            "--cores",
            str(cores),
        ],
        "rename.fastq",
        "suffix.fastq",
    )


def test_rename_comment_without_id(run, cores):
    run(
        [
            "--rename={adapter_name};{comment}",
            "-a",
            "adapter=TTTTTT",
            "--cores",
            str(cores),
        ],
        "rename_comment_without_id.fastq",
        "suffix.fastq",
    )


def test_terminates_correctly_on_error_in_subprocess(tmp_path):
    params = [
        "-j",
        "2",
        "-o",
        tmp_path / "out.fastq.gz",
        datapath("format-error.fastq"),
    ]
    with pytest.raises(SystemExit):
        main(params)


def test_json_report_and_discard_untrimmed(tmp_path):
    stats = main(
        [
            "--json",
            tmp_path / "cutadapt.json",
            "--discard-untrimmed",
            "-a",
            "name=ACGT",
            "-o",
            tmp_path / "trimmed.fastq",
            datapath("illumina.fastq.gz"),
        ]
    )
    assert stats.n == 100
    assert stats.written == 64
    js = stats.as_json()
    assert js["read_counts"]["filtered"]["discard_untrimmed"] == 36


def test_json_report_and_discard_trimmed(tmp_path):
    stats = main(
        [
            "--json",
            tmp_path / "cutadapt.json",
            "--discard-trimmed",
            "-a",
            "name=ACGT",
            "-o",
            tmp_path / "trimmed.fastq",
            datapath("illumina.fastq.gz"),
        ]
    )
    assert stats.n == 100
    assert stats.written == 36
    js = stats.as_json()
    assert js["read_counts"]["filtered"]["discard_trimmed"] == 64


def test_json_report_with_demultiplexing_and_discard_untrimmed(tmp_path):
    stats = main(
        [
            "--json",
            tmp_path / "demux.cutadapt.json",
            "--discard-untrimmed",
            "-a",
            "name=ACGT",
            "-o",
            tmp_path / "{name}.fastq",
            datapath("illumina.fastq.gz"),
        ]
    )
    assert stats.n == 100
    assert stats.written == 64
    js = stats.as_json()
    assert js["read_counts"]["filtered"]["discard_untrimmed"] == 36


def test_does_not_hang_on_error_in_reader_process(tmp_path, cores):
    with pytest.raises(SystemExit) as e:
        main(
            [
                f"--cores={cores}",
                "-o",
                tmp_path / "out.fastq",
                tmp_path / "does-not-exist.fastq",
            ],
        )
    assert e.value.args[0] == 1


@pytest.mark.skipif(sys.platform != "linux", reason="Platform specific")
def test_process_substitution(tmp_path, cores):
    with open(datapath("small.fastq")) as infile:
        inpath = f"/dev/fd/{infile.fileno()}"
        main(
            [
                f"--cores={cores}",
                "-o",
                tmp_path / "out.fastq",
                inpath,
            ]
        )
    assert_files_equal(datapath("small.fastq"), tmp_path / "out.fastq")
