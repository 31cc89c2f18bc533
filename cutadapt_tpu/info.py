"""Per-read modification metadata passed between pipeline stages."""


class ModificationInfo:
    """
    Created for each read passing through the pipeline. Records any
    information (except the read itself) that modifiers need to pass to
    later modifiers or to the filters.
    """

    __slots__ = ("matches", "original_read", "cut_prefix", "cut_suffix", "is_rc")

    def __init__(self, read):
        self.matches = []
        self.original_read = read
        self.cut_prefix = None
        self.cut_suffix = None
        self.is_rc = None

    def __repr__(self):
        return (
            "ModificationInfo("
            f"matches={self.matches!r}, "
            f"original_read={self.original_read}, "
            f"cut_prefix={self.cut_prefix}, "
            f"cut_suffix={self.cut_suffix}, "
            f"is_rc={self.is_rc})"
        )
