"""JSON serialization with selective one-line formatting."""

import json


class OneLine:
    """Wrap a value to print it on one line in the JSON output."""

    def __init__(self, value):
        self.value = value


def dumps(obj, indent: int = 2, _level: int = 0) -> str:
    """
    Encode an object hierarchy as a JSON string, disabling indentation
    for any part wrapped in OneLine.

    >>> print(dumps({"a": [1, 2], "b": OneLine([3, 4])}))
    {
      "a": [
        1,
        2
      ],
      "b": [3, 4]
    }
    """
    if isinstance(obj, (float, int, str, bool, OneLine)) or obj is None:
        if isinstance(obj, OneLine):
            obj = obj.value
        return json.dumps(obj)

    start = "\n" + (_level + 1) * indent * " "
    sep = "," + start
    end = "\n" + _level * indent * " "
    if isinstance(obj, (tuple, list)):
        if not obj:
            return "[]"
        return (
            "["
            + start
            + sep.join(dumps(elem, indent, _level + 1) for elem in obj)
            + end
            + "]"
        )
    elif isinstance(obj, dict):
        if not obj:
            return "{}"
        return (
            "{"
            + start
            + sep.join(
                json.dumps(k) + ": " + dumps(v, indent, _level + 1)
                for k, v in obj.items()
            )
            + end
            + "}"
        )
    else:
        raise ValueError(f"cannot serialize type {obj.__class__.__name__}")
