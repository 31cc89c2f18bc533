"""Sequence I/O: records, FASTA/FASTQ/BAM parsing, compressed files."""

from .records import (
    BamFormatError,
    FastaFormatError,
    FastqFormatError,
    FileFormatError,
    SequenceRecord,
    UnknownFileFormat,
    record_names_match,
    records_are_mates,
    reverse_complement,
)
from .fastq import (
    open_sequence_file,
    parse_fasta,
    parse_fastq,
    read_chunks,
    read_paired_chunks,
)
from .compressed import xopen

__all__ = [
    "BamFormatError",
    "FastaFormatError",
    "FastqFormatError",
    "FileFormatError",
    "SequenceRecord",
    "UnknownFileFormat",
    "record_names_match",
    "records_are_mates",
    "reverse_complement",
    "open_sequence_file",
    "parse_fasta",
    "parse_fastq",
    "read_chunks",
    "read_paired_chunks",
    "xopen",
]
