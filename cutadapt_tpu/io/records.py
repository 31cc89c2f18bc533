"""
Sequence records and related helpers.

Provides the record model that the rest of the engine works with
(equivalent in capability to the reference's external dnaio dependency,
see /root/reference/src/cutadapt/files.py:109-114 for how it is used).
"""

from typing import Optional


class UnknownFileFormat(Exception):
    """Raised when the format of an input file cannot be recognized."""


class FileFormatError(Exception):
    """Raised when an input file is malformed."""

    format_name = "file"

    def __init__(self, msg, line: Optional[int] = None):
        super().__init__(msg, line)
        self.message = msg
        self.line = line  # 0-based line number where the error occurred

    def __str__(self):
        line = "unknown line" if self.line is None else f"line {self.line + 1}"
        return f"Error in {self.format_name} file at {line}: {self.message}"


class FastaFormatError(FileFormatError):
    format_name = "FASTA"


class FastqFormatError(FileFormatError):
    format_name = "FASTQ"


class BamFormatError(FileFormatError):
    format_name = "BAM"


_COMPLEMENT = {
    "A": "T", "C": "G", "G": "C", "T": "A", "U": "A",
    "M": "K", "R": "Y", "W": "W", "S": "S", "Y": "R", "K": "M",
    "V": "B", "H": "D", "D": "H", "B": "V", "N": "N", "X": "X",
}
_COMPLEMENT_TABLE = str.maketrans(
    {**_COMPLEMENT, **{k.lower(): v.lower() for k, v in _COMPLEMENT.items()}}
)


def reverse_complement(sequence: str) -> str:
    return sequence.translate(_COMPLEMENT_TABLE)[::-1]


class SequenceRecord:
    """A named sequence with optional qualities.

    Lightweight: supports len(), slicing (returns a new record with the
    same name), equality and reverse_complement().
    """

    __slots__ = ("name", "sequence", "qualities")

    def __init__(
        self, name: str, sequence: str, qualities: Optional[str] = None
    ):
        self.name = name
        self.sequence = sequence
        self.qualities = qualities

    def __repr__(self):
        qstr = ""
        if self.qualities is not None:
            qstr = f", qualities={_shorten(self.qualities)!r}"
        return (
            f"SequenceRecord(name={_shorten(self.name)!r}, "
            f"sequence={_shorten(self.sequence)!r}{qstr})"
        )

    def __len__(self) -> int:
        return len(self.sequence)

    def __getitem__(self, key) -> "SequenceRecord":
        return SequenceRecord(
            self.name,
            self.sequence[key],
            self.qualities[key] if self.qualities is not None else None,
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SequenceRecord)
            and self.name == other.name
            and self.sequence == other.sequence
            and self.qualities == other.qualities
        )

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    @property
    def id(self) -> str:
        return self.name.split(maxsplit=1)[0] if self.name else ""

    @property
    def comment(self) -> Optional[str]:
        fields = self.name.split(maxsplit=1)
        return fields[1] if len(fields) == 2 else None

    def reverse_complement(self) -> "SequenceRecord":
        quals = self.qualities[::-1] if self.qualities is not None else None
        return SequenceRecord(
            self.name, reverse_complement(self.sequence), quals
        )

    def fastq_bytes(self) -> bytes:
        quals = self.qualities if self.qualities is not None else ""
        return f"@{self.name}\n{self.sequence}\n+\n{quals}\n".encode("ascii")

    def fasta_bytes(self) -> bytes:
        return f">{self.name}\n{self.sequence}\n".encode("ascii")


def _shorten(s: Optional[str], n: int = 60) -> Optional[str]:
    if s is None:
        return None
    return s if len(s) <= n else s[: n - 3] + "..."


def record_names_match(header1: str, header2: str) -> bool:
    """
    Check whether the read IDs in the two headers match, ignoring a
    trailing '1', '2' or '3' (read-number suffix conventions).
    """
    id1 = header1.split(maxsplit=1)[0] if header1 else ""
    id2 = header2.split(maxsplit=1)[0] if header2 else ""
    if id1 and id1[-1] in "123":
        id1 = id1[:-1]
    if id2 and id2[-1] in "123":
        id2 = id2[:-1]
    return id1 == id2


def records_are_mates(record1: SequenceRecord, record2: SequenceRecord) -> bool:
    return record_names_match(record1.name, record2.name)
