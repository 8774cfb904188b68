"""Result presentation: the agent's table formatter (SURVEY §2.2 M10/A6).

Re-implements `lambda/webbackend/agent_processor.py:536-606`: results
are rendered as a ``|``-joined text table; at or above
``ROW_THRESHOLD`` rows only a ``PREVIEW_ROWS``-row preview is shown
with a row count and a download hint.  The row-count probe is a
streamed ``limit(threshold + 1)`` — never a full count of a huge
result."""

from __future__ import annotations

import ray.data

ROW_THRESHOLD = 300   # agent_processor.py:43
PREVIEW_ROWS = 20     # agent_processor.py:576-584


def _fmt_rows(header: list[str], rows: list[list]) -> str:
    out = [" | ".join(header)]
    for r in rows:
        out.append(" | ".join("" if v is None else str(v) for v in r))
    return "\n".join(out)


def format_result(ds: "ray.data.Dataset") -> dict:
    """Returns {text, row_count_probe, truncated}.

    ``row_count_probe`` is exact below the threshold; above it, the
    value is ``ROW_THRESHOLD`` and ``truncated`` is True (the
    reference's `MaxResults=301` page probe, `:523-533`)."""
    probe = ds.limit(ROW_THRESHOLD + 1).take(ROW_THRESHOLD + 1)
    n = len(probe)
    truncated = n > ROW_THRESHOLD
    if not probe:
        return {"text": "(no rows)", "row_count_probe": 0, "truncated": False}
    header = list(probe[0].keys())
    shown = probe[:PREVIEW_ROWS] if truncated else probe
    text = _fmt_rows(header, [[r[c] for c in header] for r in shown])
    if truncated:
        text += (
            f"\n… {ROW_THRESHOLD}+ rows — showing first {PREVIEW_ROWS}; "
            "use the download link for the full result"
        )
    return {
        "text": text,
        "row_count_probe": min(n, ROW_THRESHOLD),
        "truncated": truncated,
    }


__all__ = ["format_result", "ROW_THRESHOLD", "PREVIEW_ROWS"]
