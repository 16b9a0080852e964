"""TOON (Token-Oriented Object Notation) response formatting.

The reference offers ``response_format=toon`` on search/get routes
(routers/v1/memory_routes_v1.py:2232-2239, encoder call :3175-3189 with
``{indent: 2, delimiter: ',', lengthMarker: '#'}`` after strip_empty_values)
— a compact plain-text rendering that cuts LLM token usage 30-60% vs JSON.

This is a minimal deterministic encoder of the public TOON shape:

- scalars:            ``key: value``
- uniform obj arrays: ``key[#N]{f1,f2}:`` header + one delimited row per item
- other arrays:       ``key[#N]: v1,v2,...``
- nested objects:     indented blocks

Presentation-layer only — the engine's DataFrames stay columnar; this runs on
the <= top-k rows a route returns.
"""

from __future__ import annotations

from typing import Any


def strip_empty_values(obj: Any) -> Any:
    """Drop empty strings/lists/dicts/None recursively (the pre-encoding
    cleaning pass at memory_routes_v1.py:3167)."""
    if isinstance(obj, dict):
        out = {k: strip_empty_values(v) for k, v in obj.items()}
        return {k: v for k, v in out.items() if v not in ("", [], {}, None)}
    if isinstance(obj, list):
        return [strip_empty_values(v) for v in obj]
    return obj


def _scalar(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, float):
        return repr(round(v, 6))
    return str(v)


def _is_uniform_objects(arr: list) -> bool:
    if not arr or not all(isinstance(x, dict) for x in arr):
        return False
    keys = list(arr[0].keys())
    return all(list(x.keys()) == keys for x in arr) and all(
        not isinstance(v, (dict, list)) for x in arr for v in x.values()
    )


def toon_encode(obj: Any, indent: int = 2, delimiter: str = ",",
                length_marker: str = "#") -> str:
    """Encode a (cleaned) dict to TOON text."""
    lines: list[str] = []

    def emit(key: str, value: Any, depth: int) -> None:
        pad = " " * (indent * depth)
        if isinstance(value, dict):
            lines.append(f"{pad}{key}:")
            for k, v in value.items():
                emit(k, v, depth + 1)
        elif isinstance(value, list):
            n = f"[{length_marker}{len(value)}]"
            if _is_uniform_objects(value):
                fields = list(value[0].keys())
                lines.append(f"{pad}{key}{n}{{{delimiter.join(fields)}}}:")
                rowpad = " " * (indent * (depth + 1))
                for item in value:
                    lines.append(rowpad + delimiter.join(_scalar(item[f]) for f in fields))
            elif all(not isinstance(v, (dict, list)) for v in value):
                lines.append(f"{pad}{key}{n}: " + delimiter.join(_scalar(v) for v in value))
            else:
                lines.append(f"{pad}{key}{n}:")
                for i, item in enumerate(value):
                    emit(str(i), item, depth + 1)
        else:
            lines.append(f"{pad}{key}: {_scalar(value)}")

    if isinstance(obj, dict):
        for k, v in obj.items():
            emit(k, v, 0)
    else:
        emit("value", obj, 0)
    return "\n".join(lines)


def format_search_response(rows: list[dict], query: str | None = None,
                           response_format: str = "toon") -> str:
    """Route-shaped formatter: the reference's search response rendered as TOON
    (or JSON when requested) from collected top-k rows."""
    import json

    payload: dict[str, Any] = {"status": "success"}
    if query:
        payload["query"] = query
    payload["memories"] = rows
    payload = strip_empty_values(payload)
    if response_format == "toon":
        return toon_encode(payload)
    return json.dumps(payload, default=str)
