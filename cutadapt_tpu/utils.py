"""Small utilities: CPU counting and progress reporting."""

import logging
import multiprocessing
import re
import sys
import time

logger = logging.getLogger(__name__)

MICRO = "µ"


def available_cpu_count() -> int:
    """
    Number of available virtual or physical CPUs, honoring cpuset(7)
    restrictions where present.
    """
    try:
        with open("/proc/self/status") as f:
            status = f.read()
        m = re.search(r"(?m)^Cpus_allowed:\s*(.*)$", status)
        if m:
            res = bin(int(m.group(1).replace(",", ""), 16)).count("1")
            if res > 0:
                return min(res, multiprocessing.cpu_count())
    except OSError:
        pass
    return multiprocessing.cpu_count()


class Progress:
    """Animated progress line on stderr with reads/s statistics."""

    def __init__(self, every: float = 1):
        self._every = every
        self._animation = self.scissors()
        self._n = 0
        self._start_time = time.time()
        self._last_time = self._start_time
        self._last_n = 0

    def __repr__(self):
        return (
            f"Progress(_n={self._n}, "
            f"elapsed={self._last_time - self._start_time:.3f})"
        )

    @staticmethod
    def scissors(width: int = 10):
        while True:
            for is_reverse, rang in [
                (False, range(width + 1)),
                (True, range(width + 1)),
            ]:
                for position in rang:
                    for is_open in (True, False):
                        left = " " * position
                        right = "-" * (width - position)
                        if is_reverse:
                            sc = ">8" if is_open else "=8"
                            left, right = right, left
                        else:
                            sc = "8<" if is_open else "8="
                        yield "[" + left + sc + right + "]"

    def update(self, increment: int, _final: bool = False) -> None:
        self._n += increment
        current_time = time.time()
        if _final:
            time_delta = current_time - self._start_time
            delta = self._n
        else:
            time_delta = current_time - self._last_time
            delta = self._n - self._last_n
        if delta < 1 or time_delta == 0:
            return
        if not _final and time_delta < self._every:
            return

        t = current_time - self._start_time
        hours = int(t) // 3600
        minutes = (int(t) - hours * 3600) // 60
        seconds = int(t) % 60
        per_second = delta / time_delta
        per_item = time_delta / delta

        animation = next(self._animation)
        if _final:
            animation = "Done".ljust(len(animation))
        print(
            "\r"
            f"{animation} {hours:02d}:{minutes:02d}:{seconds:02d} "
            f"{self._n:13,d} reads @ {per_item * 1e6:5.1F} {MICRO}s/read; "
            f"{per_second * 60 / 1e6:6.2F} M reads/minute",
            end="",
            file=sys.stderr,
        )
        self._last_time = current_time
        self._last_n = self._n

    def close(self) -> None:
        self.update(0, _final=True)
        print(file=sys.stderr)


class DummyProgress(Progress):
    """Progress reporter that prints nothing."""

    def update(self, increment, _final=False) -> None:
        pass

    def close(self) -> None:
        pass
