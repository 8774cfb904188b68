"""Source/sink operators beyond Parquet (SURVEY §2.1).

- :func:`write_segment_jsonl` / :func:`read_segment_results` — the
  Personalize batch-job JSONL surface: one ``{"itemId": id}`` per line
  out (`lambda/create_personalize_segment/index.py:174-188`, S5); the
  result files ``{input:{itemId}, output:{usersList:[…]}}`` exploded
  to one ``(item_id, user_id)`` row per list element
  (`lambda/process_segment_results/index.py:146-192`, S6).
- :func:`read_csv_table` — header CSV with declared schema (the Glue
  S3Table reader, `lib/data-storage.ts:60-105`, S1).
- :func:`overwrite_dir` — the delete-then-swap output prefix
  (`lambda/integrated_customer_updater/index.py:16-86`, S3/S4):
  write to a temp dir, atomically rename over the destination.
- :func:`detect_and_decode` — encoding sniffing (utf-8 / shift-jis /
  cp932) for user-supplied files (`csvtool/csv_to_glue_catalog.py:252-270`, M7).
- :func:`group_files_by_header` — md5 header-hash grouping: one
  logical table per identical header set
  (`csvtool/csv_to_glue_catalog.py:272-276,369-373`, M8).
"""

from __future__ import annotations

import csv
import hashlib
import os
import shutil

import pyarrow as pa

import ray.data


def write_segment_jsonl(item_ids: list[str], path: str) -> None:
    """One ``{"itemId": id}`` JSON object per line (S5)."""
    ds = ray.data.from_items([{"itemId": i} for i in item_ids])
    ds.repartition(1).write_json(path)


def read_segment_results(path: str) -> "ray.data.Dataset":
    """Explode ``{input:{itemId}, output:{usersList:[...]}}`` lines to
    ``(item_id, user_id)`` rows (S6) — `read_json` + a flat-map batch."""

    def _explode(batch: pa.Table) -> pa.Table:
        items, users = [], []
        for inp, out in zip(batch["input"].to_pylist(), batch["output"].to_pylist()):
            item = inp["itemId"]
            for u in out["usersList"] or []:
                items.append(item)
                users.append(u)
        return pa.table(
            {
                "item_id": pa.array(items, pa.string()),
                "user_id": pa.array(users, pa.string()),
            }
        )

    return ray.data.read_json(path).map_batches(_explode, batch_format="pyarrow")


def read_csv_table(
    path: str, schema: "pa.Schema | None" = None
) -> "ray.data.Dataset":
    """Header CSV reader with optional declared schema (S1).  The
    reference's `skip.header.line.count: '1'` is the default CSV header
    behavior here."""
    if schema is None:
        return ray.data.read_csv(path)
    from pyarrow import csv as pacsv

    return ray.data.read_csv(
        path,
        convert_options=pacsv.ConvertOptions(column_types=schema),
    )


def overwrite_dir(ds: "ray.data.Dataset", dest: str) -> int:
    """Full-refresh sink (S3/S4): write to ``dest.tmp``, then swap it
    over ``dest`` — readers never observe a half-written prefix.
    Returns the row count written."""
    tmp = dest.rstrip("/") + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    n = ray.data.read_parquet(tmp).count()
    old = dest.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dest):
        os.replace(dest, old)
    os.replace(tmp, dest)
    shutil.rmtree(old, ignore_errors=True)
    return n


ENCODINGS = ("utf-8", "shift-jis", "cp932")


def detect_and_decode(raw: bytes) -> tuple[str, str]:
    """Try utf-8 / shift-jis / cp932 in order; return (text, encoding)
    (M7).  Raises ``UnicodeDecodeError`` if none fit."""
    last: Exception | None = None
    for enc in ENCODINGS:
        try:
            return raw.decode(enc), enc
        except UnicodeDecodeError as e:  # noqa: PERF203
            last = e
    raise last  # type: ignore[misc]


def group_files_by_header(paths: list[str]) -> dict[str, list[str]]:
    """md5 of the sorted header column list → file paths (M8): files
    sharing a header become one logical table."""
    groups: dict[str, list[str]] = {}
    for p in paths:
        raw = open(p, "rb").read(65536)
        text, _enc = detect_and_decode(raw)
        header = next(csv.reader(text.splitlines()))
        key = hashlib.md5(",".join(sorted(header)).encode()).hexdigest()
        groups.setdefault(key, []).append(p)
    return groups


__all__ = [
    "write_segment_jsonl",
    "read_segment_results",
    "read_csv_table",
    "overwrite_dir",
    "detect_and_decode",
    "group_files_by_header",
]
