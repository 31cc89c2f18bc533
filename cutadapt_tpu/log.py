"""Logging setup with a custom REPORT level for --report=minimal."""

import logging
import sys

# Custom log level between INFO and WARNING so that minimal-report mode
# can emit exactly one line.
REPORT = 25


class CrashingHandler(logging.StreamHandler):
    def emit(self, record):
        """Unlike the base class, do not swallow exceptions."""
        msg = self.format(record)
        stream = self.stream
        stream.write(msg)
        stream.write(self.terminator)
        self.flush()


class NiceFormatter(logging.Formatter):
    """Prefix all levels except INFO/REPORT with the level name."""

    def format(self, record):
        if record.levelno not in (logging.INFO, REPORT):
            record.msg = f"{record.levelname}: {record.msg}"
        return super().format(record)


def setup_logging(logger, log_to_stderr=True, minimal=False, quiet=False, debug=0):
    """Attach handlers to the given (root) logger."""
    logging.addLevelName(REPORT, "REPORT")

    stream_handler = CrashingHandler(sys.stderr if log_to_stderr else sys.stdout)
    stream_handler.setFormatter(NiceFormatter())
    # debug overrides quiet overrides minimal
    if debug > 0:
        level = logging.DEBUG
    elif quiet:
        level = logging.ERROR
    elif minimal:
        level = REPORT
    else:
        level = logging.INFO
    stream_handler.setLevel(level)
    stderr_level = logging.WARNING
    stream_handler.addFilter(lambda record: record.levelno < stderr_level)
    logger.setLevel(level)
    logger.addHandler(stream_handler)

    stderr_handler = CrashingHandler(sys.stderr)
    stderr_handler.setLevel(stderr_level)
    logger.addHandler(stderr_handler)
