"""From-scratch Apache Iceberg v2 metadata-log emitter (SURVEY §2 S8).

The reference's csvtool CTAS materializes an ICEBERG table in Glue
(`csvtool/csv_to_glue_catalog.py:279-314`); this engine's `run_stage`
sinks write plain partitioned Parquet + a JSON manifest.  This module
closes the table-format gap: :func:`freeze_iceberg_table` wraps an
existing Parquet data directory in a spec-conformant Iceberg v2
metadata log —

    <table>/data/*.parquet            (the existing files, untouched)
    <table>/metadata/v1.metadata.json (TableMetadata, format-version 2)
    <table>/metadata/snap-<id>-m0.avro      (manifest file)
    <table>/metadata/snap-<id>.avro         (manifest list)
    <table>/metadata/version-hint.text

so an Iceberg-aware engine (Spark, Trino, DuckDB-iceberg, pyiceberg)
can read the output as a static table via the filesystem catalog
convention (version-hint → vN.metadata.json).

The container ships NO Avro library and NO Iceberg reader, so the Avro
object-container encoding (spec 1.11: zigzag varints, deflate-less
null codec, 16-byte sync markers) is implemented from the public spec
below, together with an INDEPENDENT minimal Avro reader used by the
round-trip tests — the writer is validated against the spec's binary
layout, not against itself alone (tests/test_iceberg.py).

Everything is deterministic: table UUID, snapshot id and sync markers
derive from the data-file listing, so re-freezing identical data is
byte-identical (resumable-output friendly).
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import time

import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Avro binary encoding (writer)
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag + base-128 varint (little-endian groups)."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_encode(schema, value, out: bytearray) -> None:
    """Schema-driven generic encoder for the subset Iceberg needs:
    null/boolean/int/long/float/double/string/bytes, record, array,
    map, union.  Unions pick the null branch for None, else the first
    non-null branch (Iceberg metadata only uses [null, X] unions)."""
    if isinstance(schema, list):  # union
        if value is None:
            idx = schema.index("null")
            out += _zigzag(idx)
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        out += _zigzag(idx)
        _avro_encode(schema[idx], value, out)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "string":
        b = value.encode("utf-8")
        out += _zigzag(len(b)) + b
    elif t == "bytes":
        out += _zigzag(len(value)) + bytes(value)
    elif t == "record":
        for f in schema["fields"]:
            _avro_encode(f["type"], value.get(f["name"]), out)
    elif t == "array":
        items = list(value or [])
        if items:
            out += _zigzag(len(items))
            for it in items:
                _avro_encode(schema["items"], it, out)
        out += _zigzag(0)
    elif t == "map":
        items = dict(value or {})
        if items:
            out += _zigzag(len(items))
            for k, v in items.items():
                kb = k.encode("utf-8")
                out += _zigzag(len(kb)) + kb
                _avro_encode(schema["values"], v, out)
        out += _zigzag(0)
    else:
        raise NotImplementedError(f"avro type {t!r}")


def write_avro_container(
    path: str,
    schema: dict,
    records: list[dict],
    sync: bytes,
    extra_meta: dict | None = None,
) -> int:
    """One-block Avro object container file (null codec).  Returns the
    file length in bytes (the manifest list needs it).

    ``extra_meta``: additional key→value container metadata.  The
    Iceberg spec REQUIRES manifest files to carry ``schema``,
    ``schema-id``, ``partition-spec``, ``partition-spec-id``,
    ``format-version`` and ``content`` keys (and manifest lists
    ``snapshot-id``/``parent-snapshot-id``/``sequence-number``/
    ``format-version``) — external readers (pyiceberg, Spark, Trino)
    read the partition spec from the container header, not from the
    table metadata."""
    assert len(sync) == 16
    body = bytearray()
    for rec in records:
        _avro_encode(schema, rec, body)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")),
        "avro.codec": "null",
    }
    meta.update(extra_meta or {})
    out = bytearray(_MAGIC)
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb, vb = k.encode(), v.encode()
        out += _zigzag(len(kb)) + kb + _zigzag(len(vb)) + vb
    out += _zigzag(0)
    out += sync
    if records:
        out += _zigzag(len(records)) + _zigzag(len(body)) + body + sync
    with open(path, "wb") as f:
        f.write(out)
    return len(out)


# ---------------------------------------------------------------------------
# Avro binary decoding (independent reader, used by the round-trip tests)
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError
        self.pos += n
        return b

    def long(self) -> int:
        shift, u = 0, 0
        while True:
            b = self.read(1)[0]
            u |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        return (u >> 1) ^ -(u & 1)

    def decode(self, schema):
        if isinstance(schema, list):
            return self.decode(schema[self.long()])
        t = schema["type"] if isinstance(schema, dict) else schema
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) == b"\x01"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "string":
            return self.read(self.long()).decode("utf-8")
        if t == "bytes":
            return self.read(self.long())
        if t == "record":
            return {f["name"]: self.decode(f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    self.long()
                    n = -n
                out.extend(self.decode(schema["items"]) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    self.long()
                    n = -n
                for _ in range(n):
                    k = self.read(self.long()).decode()
                    out[k] = self.decode(schema["values"])
        raise NotImplementedError(t)


def read_avro_meta(path: str) -> dict:
    """Container-header key→value metadata (bytes values decoded to
    str) — lets tests assert the spec-required manifest keys."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container")
    meta = r.decode({"type": "map", "values": "bytes"})
    return {k: v.decode("utf-8") for k, v in meta.items()}


def read_avro_container(path: str) -> tuple[dict, list[dict]]:
    """Independent decoder for the container files this module writes
    (null codec).  Returns (schema, records)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container")
    meta = r.decode({"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode())
    if meta.get("avro.codec", b"null") != b"null":
        raise NotImplementedError("only the null codec is written/read")
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(r.buf):
        n = r.long()
        r.long()  # block byte length
        records.extend(r.decode(schema) for _ in range(n))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records


# ---------------------------------------------------------------------------
# Iceberg schema (pyarrow → Iceberg JSON types)
# ---------------------------------------------------------------------------

def _iceberg_type(t: pa.DataType, next_id) -> object:
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_integer(t):
        return "long" if t.bit_width > 32 else "int"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_floating(t):
        return "double"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision}, {t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamptz" if t.tz else "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        eid = next_id()
        return {
            "type": "list",
            "element-id": eid,
            "element": _iceberg_type(t.value_type, next_id),
            "element-required": False,
        }
    if pa.types.is_struct(t):
        fields = []
        for i in range(t.num_fields):
            f = t.field(i)
            fid = next_id()
            fields.append(
                {
                    "id": fid,
                    "name": f.name,
                    "required": False,
                    "type": _iceberg_type(f.type, next_id),
                }
            )
        return {"type": "struct", "fields": fields}
    raise NotImplementedError(f"no Iceberg mapping for arrow type {t}")


def iceberg_schema_json(schema: pa.Schema) -> tuple[dict, int]:
    """Iceberg JSON schema (schema-id 0) + last assigned column id."""
    counter = {"id": 0}

    def next_id() -> int:
        counter["id"] += 1
        return counter["id"]

    fields = []
    # top-level ids first (Iceberg assigns nested ids after, any order
    # is legal as long as ids are unique; we keep it simple + stable)
    for f in schema:
        fields.append({"id": next_id(), "name": f.name, "required": False})
    for f, entry in zip(schema, fields):
        entry["type"] = _iceberg_type(f.type, next_id)
    return (
        {"type": "struct", "schema-id": 0, "fields": fields},
        counter["id"],
    )


# ---------------------------------------------------------------------------
# Iceberg v2 manifest / manifest-list Avro schemas (spec field-ids)
# ---------------------------------------------------------------------------

def _f(name, typ, fid, **kw):
    d = {"name": name, "type": typ, "field-id": fid}
    d.update(kw)
    return d


def manifest_entry_schema(partition_fields: list | None = None) -> dict:
    """v2 manifest-entry Avro schema; ``partition_fields`` = list of
    (name, avro_type, iceberg_partition_field_id) for the identity
    partition struct (empty ⇒ unpartitioned r102)."""
    pf = [
        _f(name, typ, fid) for name, typ, fid in (partition_fields or [])
    ]
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            _f("status", "int", 0),
            _f("snapshot_id", ["null", "long"], 1, default=None),
            _f("sequence_number", ["null", "long"], 3, default=None),
            _f("file_sequence_number", ["null", "long"], 4, default=None),
            _f(
                "data_file",
                {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        _f("content", "int", 134),
                        _f("file_path", "string", 100),
                        _f("file_format", "string", 101),
                        _f(
                            "partition",
                            {"type": "record", "name": "r102", "fields": pf},
                            102,
                        ),
                        _f("record_count", "long", 103),
                        _f("file_size_in_bytes", "long", 104),
                    ],
                },
                2,
            ),
        ],
    }


MANIFEST_ENTRY_SCHEMA = manifest_entry_schema([])

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _f("manifest_path", "string", 500),
        _f("manifest_length", "long", 501),
        _f("partition_spec_id", "int", 502),
        _f("content", "int", 517),
        _f("sequence_number", "long", 515),
        _f("min_sequence_number", "long", 516),
        _f("added_snapshot_id", "long", 503),
        _f("added_files_count", "int", 504),
        _f("existing_files_count", "int", 505),
        _f("deleted_files_count", "int", 506),
        _f("added_rows_count", "long", 512),
        _f("existing_rows_count", "long", 513),
        _f("deleted_rows_count", "long", 514),
    ],
}


def manifest_meta(
    schema_json: dict, spec_fields: list, spec_id: int = 0
) -> dict:
    """Spec-required manifest-file container metadata (Iceberg spec
    "Manifests": schema / schema-id / partition-spec /
    partition-spec-id / format-version / content)."""
    return {
        "schema": json.dumps(schema_json, separators=(",", ":")),
        "schema-id": str(schema_json.get("schema-id", 0)),
        "partition-spec": json.dumps(spec_fields, separators=(",", ":")),
        "partition-spec-id": str(spec_id),
        "format-version": "2",
        "content": "data",
    }


def manifest_list_meta(
    snapshot_id: int, parent_snapshot_id, sequence_number: int
) -> dict:
    """Spec-required manifest-list container metadata (Iceberg spec
    "Snapshots": snapshot-id / parent-snapshot-id / sequence-number /
    format-version)."""
    return {
        "snapshot-id": str(snapshot_id),
        "parent-snapshot-id": (
            "null" if parent_snapshot_id is None else str(parent_snapshot_id)
        ),
        "sequence-number": str(sequence_number),
        "format-version": "2",
    }


# ---------------------------------------------------------------------------
# table freeze
# ---------------------------------------------------------------------------

def _hive_partition_infos(data_dir: str, partition_by: list[str]) -> list:
    """Recursive *.parquet listing with hive ``col=value`` dirs parsed
    into typed partition values (int when every value parses, else
    string — deterministic)."""
    import glob as _glob
    from urllib.parse import unquote

    infos = []
    for p in sorted(
        _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    ):
        rel = os.path.relpath(p, data_dir)
        kv = {}
        for seg in rel.split(os.sep)[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                kv[k] = unquote(v)
        missing = [c for c in partition_by if c not in kv]
        if missing:
            raise ValueError(
                f"{p}: hive dirs missing partition columns {missing}"
            )
        infos.append(
            {
                "path": os.path.abspath(p),
                "rows": pq.ParquetFile(p).metadata.num_rows,
                "bytes": os.path.getsize(p),
                "partition": {c: kv[c] for c in partition_by},
            }
        )
    if not infos:
        raise ValueError(f"no parquet files under {data_dir}")

    def _all_int(col):
        try:
            for i in infos:
                int(i["partition"][col])
            return True
        except ValueError:
            return False

    for col in partition_by:
        if _all_int(col):
            for i in infos:
                i["partition"][col] = int(i["partition"][col])
    return infos


def freeze_iceberg_table(
    table_dir: str,
    data_dir: str | None = None,
    snapshot_ts_ms: int | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Wrap ``<table_dir>/data/*.parquet`` (or an explicit ``data_dir``)
    in an Iceberg v2 metadata log under ``<table_dir>/metadata/``.

    Single append snapshot over the current file listing — exactly the
    shape of a `run_stage` full-refresh output (the overwrite-prefix
    sink's swap makes every freeze a clean v1).  File row counts and
    sizes come from the Parquet footers (no data read).

    ``partition_by``: hive-layout identity partitioning (the layout
    ``Dataset.write_parquet(partition_cols=...)`` produces).  Partition
    VALUES are parsed from the ``col=value`` directory names, typed
    int-if-every-value-parses else string, recorded per data file in
    the manifest's partition struct, appended to the table schema
    (hive files do not contain the columns), and declared as identity
    partition-spec fields — an Iceberg reader (and
    :func:`read_iceberg_table`) reconstitutes the columns from
    metadata.  Returns a summary dict (paths + counts).
    """
    data_dir = data_dir or os.path.join(table_dir, "data")
    partition_by = list(partition_by or [])
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    if partition_by:
        infos = _hive_partition_infos(data_dir, partition_by)
    else:
        files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        if not files:
            raise ValueError(f"no parquet files under {data_dir}")
        infos = [
            {
                "path": os.path.abspath(os.path.join(data_dir, name)),
                "rows": pq.ParquetFile(
                    os.path.join(data_dir, name)
                ).metadata.num_rows,
                "bytes": os.path.getsize(os.path.join(data_dir, name)),
                "partition": {},
            }
            for name in files
        ]
    schema = pq.ParquetFile(infos[0]["path"]).schema_arrow

    # deterministic ids from the listing (re-freeze == byte-identical)
    fp = hashlib.sha256(
        json.dumps(infos, sort_keys=True).encode()
    ).digest()
    snapshot_id = int.from_bytes(fp[:8], "big") & ((1 << 62) - 1)
    table_uuid = "-".join(
        fp[8:24].hex()[s:e]
        for s, e in ((0, 8), (8, 12), (12, 16), (16, 20), (20, 32))
    )
    sync = fp[16:32]
    ts_ms = snapshot_ts_ms if snapshot_ts_ms is not None else int(
        time.time() * 1000
    )

    # partition typing (avro + iceberg) from the parsed values
    part_avro = {
        c: (
            "long"
            if partition_by and isinstance(infos[0]["partition"][c], int)
            else "string"
        )
        for c in partition_by
    }

    # table schema + identity partition spec (also stamped into the
    # manifest container header below — spec-required metadata keys)
    schema_json, last_col_id = iceberg_schema_json(schema)
    # hive-partitioned files do not CONTAIN the partition columns —
    # append them to the table schema; the identity spec sources them
    spec_fields = []
    for i, c in enumerate(partition_by):
        last_col_id += 1
        schema_json["fields"].append(
            {
                "id": last_col_id,
                "name": c,
                "required": False,
                "type": "long" if part_avro[c] == "long" else "string",
            }
        )
        spec_fields.append(
            {
                "name": c,
                "transform": "identity",
                "source-id": last_col_id,
                "field-id": 1000 + i,
            }
        )

    # manifest
    manifest_path = os.path.join(meta_dir, f"snap-{snapshot_id}-m0.avro")
    entry_schema = manifest_entry_schema(
        [(c, part_avro[c], 1000 + i) for i, c in enumerate(partition_by)]
    )
    entries = [
        {
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": None,  # inherited from the snapshot
            "file_sequence_number": None,
            "data_file": {
                "content": 0,  # DATA
                "file_path": i["path"],
                "file_format": "PARQUET",
                "partition": i["partition"],
                "record_count": i["rows"],
                "file_size_in_bytes": i["bytes"],
            },
        }
        for i in infos
    ]
    manifest_len = write_avro_container(
        manifest_path, entry_schema, entries, sync,
        extra_meta=manifest_meta(schema_json, spec_fields),
    )

    # manifest list
    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    total_rows = sum(i["rows"] for i in infos)
    write_avro_container(
        list_path,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": os.path.abspath(manifest_path),
                "manifest_length": manifest_len,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(infos),
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": total_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        ],
        sync,
        extra_meta=manifest_list_meta(snapshot_id, None, 1),
    )

    metadata = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": os.path.abspath(table_dir),
        "last-sequence-number": 1,
        "last-updated-ms": ts_ms,
        "last-column-id": last_col_id,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 999 + len(spec_fields),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.format.default": "parquet"},
        "current-snapshot-id": snapshot_id,
        "snapshots": [
            {
                "snapshot-id": snapshot_id,
                "sequence-number": 1,
                "timestamp-ms": ts_ms,
                "manifest-list": os.path.abspath(list_path),
                "summary": {
                    "operation": "append",
                    "added-data-files": str(len(infos)),
                    "added-records": str(total_rows),
                    "total-records": str(total_rows),
                    "total-data-files": str(len(infos)),
                },
                "schema-id": 0,
            }
        ],
        "snapshot-log": [
            {"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}
        ],
        "metadata-log": [],
    }
    md_path = os.path.join(meta_dir, "v1.metadata.json")
    with open(md_path, "w") as f:
        json.dump(metadata, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return {
        "metadata": md_path,
        "manifest_list": list_path,
        "manifest": manifest_path,
        "snapshot_id": snapshot_id,
        "data_files": len(infos),
        "rows": total_rows,
    }


def _current_metadata(table_dir: str) -> tuple[dict, int]:
    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{v}.metadata.json")) as f:
        return json.load(f), v


def append_iceberg_snapshot(
    table_dir: str,
    new_files: list[str],
    snapshot_ts_ms: int | None = None,
) -> dict:
    """APPEND commit: add ``new_files`` (parquet paths already under the
    table's storage) as a new snapshot on an existing metadata log —
    new manifest for the added files, manifest list = prior snapshot's
    manifests (re-marked EXISTING counts) + the new one, vN+1 metadata
    with both snapshots and an extended snapshot-log/metadata-log.
    The incremental-ER delta fold-in's table-format counterpart: prior
    data files are never rewritten or re-listed file-by-file."""
    from urllib.parse import unquote

    md, v = _current_metadata(table_dir)
    meta_dir = os.path.join(table_dir, "metadata")
    seq = md["last-sequence-number"] + 1
    ts_ms = snapshot_ts_ms if snapshot_ts_ms is not None else int(
        time.time() * 1000
    )
    spec = next(
        s for s in md["partition-specs"]
        if s["spec-id"] == md["default-spec-id"]
    )
    part_cols = [f["name"] for f in spec["fields"]]
    schema_fields = {
        f["name"]: f
        for f in next(
            s for s in md["schemas"]
            if s["schema-id"] == md["current-schema-id"]
        )["fields"]
    }

    def _part_of(path: str) -> dict:
        kv = {}
        for seg in path.split(os.sep):
            if "=" in seg and not seg.endswith(".parquet"):
                k, val = seg.split("=", 1)
                kv[k] = unquote(val)
        out = {}
        for c in part_cols:
            if c not in kv:
                raise ValueError(
                    f"{path}: no hive '{c}=...' dir for partition column"
                )
            out[c] = (
                int(kv[c]) if schema_fields[c]["type"] == "long" else kv[c]
            )
        return out

    infos = [
        {
            "path": os.path.abspath(p),
            "rows": pq.ParquetFile(p).metadata.num_rows,
            "bytes": os.path.getsize(p),
            "partition": _part_of(os.path.abspath(p)),
        }
        for p in sorted(new_files)
    ]
    if not infos:
        raise ValueError("append_iceberg_snapshot: no new files")
    fp = hashlib.sha256(
        (json.dumps(infos, sort_keys=True) + f"|seq{seq}").encode()
    ).digest()
    snapshot_id = int.from_bytes(fp[:8], "big") & ((1 << 62) - 1)
    sync = fp[16:32]

    manifest_path = os.path.join(meta_dir, f"snap-{snapshot_id}-m0.avro")
    entries = [
        {
            "status": 1,
            "snapshot_id": snapshot_id,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 0,
                "file_path": i["path"],
                "file_format": "PARQUET",
                "partition": i["partition"],
                "record_count": i["rows"],
                "file_size_in_bytes": i["bytes"],
            },
        }
        for i in infos
    ]
    entry_schema = manifest_entry_schema(
        [
            (
                f["name"],
                "long" if schema_fields[f["name"]]["type"] == "long"
                else "string",
                f["field-id"],
            )
            for f in spec["fields"]
        ]
    )
    cur_schema = next(
        s for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    manifest_len = write_avro_container(
        manifest_path, entry_schema, entries, sync,
        extra_meta=manifest_meta(
            cur_schema, spec["fields"], spec["spec-id"]
        ),
    )
    added_rows = sum(i["rows"] for i in infos)

    # prior manifests (from the current snapshot) ride along unchanged
    cur_snap = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, prior = read_avro_container(cur_snap["manifest-list"])
    carried = []
    for m in prior:
        carried.append(
            {
                **m,
                # files added by PRIOR snapshots are EXISTING here
                "existing_files_count": m["added_files_count"]
                + m["existing_files_count"],
                "existing_rows_count": m["added_rows_count"]
                + m["existing_rows_count"],
                "added_files_count": 0,
                "added_rows_count": 0,
            }
        )
    new_entry = {
        "manifest_path": os.path.abspath(manifest_path),
        "manifest_length": manifest_len,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(infos),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_avro_container(
        list_path, MANIFEST_FILE_SCHEMA, [new_entry] + carried, sync,
        extra_meta=manifest_list_meta(
            snapshot_id, md["current-snapshot-id"], seq
        ),
    )

    prev_total = int(cur_snap["summary"].get("total-records", "0"))
    prev_files = int(cur_snap["summary"].get("total-data-files", "0"))
    snapshot = {
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": md["current-snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": ts_ms,
        "manifest-list": os.path.abspath(list_path),
        "summary": {
            "operation": "append",
            "added-data-files": str(len(infos)),
            "added-records": str(added_rows),
            "total-records": str(prev_total + added_rows),
            "total-data-files": str(prev_files + len(infos)),
        },
        "schema-id": md["current-schema-id"],
    }
    new_md = {
        **md,
        "last-sequence-number": seq,
        "last-updated-ms": ts_ms,
        "current-snapshot-id": snapshot_id,
        "snapshots": md["snapshots"] + [snapshot],
        "snapshot-log": md["snapshot-log"]
        + [{"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}],
        "metadata-log": md["metadata-log"]
        + [
            {
                "metadata-file": os.path.join(
                    meta_dir, f"v{v}.metadata.json"
                ),
                "timestamp-ms": md["last-updated-ms"],
            }
        ],
    }
    md_path = os.path.join(meta_dir, f"v{v + 1}.metadata.json")
    with open(md_path, "w") as f:
        json.dump(new_md, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(v + 1))
    return {
        "metadata": md_path,
        "manifest_list": list_path,
        "manifest": manifest_path,
        "snapshot_id": snapshot_id,
        "data_files": len(infos),
        "rows": added_rows,
    }


def compact_iceberg_table(
    table_dir: str,
    target_file_rows: int = 1_000_000,
    snapshot_ts_ms: int | None = None,
) -> dict:
    """Rewrite-data-files commit (operation ``replace``): coalesce the
    current snapshot's live data files into ~``target_file_rows``
    parquet files under ``<table>/data/compacted-<seq>/``, then commit
    a snapshot whose manifest lists the new files as ADDED and the old
    ones as DELETED (status 2) — total rows unchanged, small-file
    count collapsed.  Prior snapshots still reference the old files
    (which stay on disk until :func:`expire_iceberg_snapshots` retires
    those snapshots AND a file GC removes unreferenced data).  Only
    unpartitioned tables compact (a partitioned compaction must
    preserve partition boundaries — raise loudly rather than merge
    across them)."""
    import ray.data

    md, v = _current_metadata(table_dir)
    meta_dir = os.path.join(table_dir, "metadata")
    spec = next(
        s for s in md["partition-specs"]
        if s["spec-id"] == md["default-spec-id"]
    )
    if spec["fields"]:
        raise NotImplementedError(
            "compact_iceberg_table: partitioned tables need per-partition "
            "compaction (not implemented); compact each partition dir and "
            "append instead"
        )
    cur_snap = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, mlist = read_avro_container(cur_snap["manifest-list"])
    old_files = []
    for m in mlist:
        _, entries = read_avro_container(m["manifest_path"])
        old_files.extend(
            e["data_file"] for e in entries if e["status"] != 2
        )
    total_rows = sum(f["record_count"] for f in old_files)
    seq = md["last-sequence-number"] + 1
    out_dir = os.path.join(table_dir, "data", f"compacted-{seq}")
    os.makedirs(out_dir, exist_ok=True)
    n_out = max(1, -(-total_rows // target_file_rows))
    ray.data.read_parquet(
        sorted(f["file_path"] for f in old_files)
    ).repartition(n_out).write_parquet(out_dir)

    ts_ms = snapshot_ts_ms if snapshot_ts_ms is not None else int(
        time.time() * 1000
    )
    new_infos = [
        {
            "path": os.path.abspath(os.path.join(out_dir, name)),
            "rows": pq.ParquetFile(
                os.path.join(out_dir, name)
            ).metadata.num_rows,
            "bytes": os.path.getsize(os.path.join(out_dir, name)),
        }
        for name in sorted(os.listdir(out_dir))
        if name.endswith(".parquet")
    ]
    assert sum(i["rows"] for i in new_infos) == total_rows
    fp = hashlib.sha256(
        (json.dumps(new_infos, sort_keys=True) + f"|compact{seq}").encode()
    ).digest()
    snapshot_id = int.from_bytes(fp[:8], "big") & ((1 << 62) - 1)
    sync = fp[16:32]

    def _entry(status, df, snap_id):
        return {
            "status": status,
            "snapshot_id": snap_id,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": df,
        }

    manifest_path = os.path.join(meta_dir, f"snap-{snapshot_id}-m0.avro")
    entries = [
        _entry(
            1,
            {
                "content": 0,
                "file_path": i["path"],
                "file_format": "PARQUET",
                "partition": {},
                "record_count": i["rows"],
                "file_size_in_bytes": i["bytes"],
            },
            snapshot_id,
        )
        for i in new_infos
    ] + [_entry(2, dict(f), snapshot_id) for f in old_files]  # DELETED
    cur_schema = next(
        s for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    manifest_len = write_avro_container(
        manifest_path, MANIFEST_ENTRY_SCHEMA, entries, sync,
        extra_meta=manifest_meta(cur_schema, [], spec["spec-id"]),
    )
    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_avro_container(
        list_path,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": os.path.abspath(manifest_path),
                "manifest_length": manifest_len,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": len(new_infos),
                "existing_files_count": 0,
                "deleted_files_count": len(old_files),
                "added_rows_count": total_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": total_rows,
            }
        ],
        sync,
        extra_meta=manifest_list_meta(
            snapshot_id, md["current-snapshot-id"], seq
        ),
    )
    snapshot = {
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": md["current-snapshot-id"],
        "sequence-number": seq,
        "timestamp-ms": ts_ms,
        "manifest-list": os.path.abspath(list_path),
        "summary": {
            "operation": "replace",
            "added-data-files": str(len(new_infos)),
            "deleted-data-files": str(len(old_files)),
            "added-records": str(total_rows),
            "deleted-records": str(total_rows),
            "total-records": str(total_rows),
            "total-data-files": str(len(new_infos)),
        },
        "schema-id": md["current-schema-id"],
    }
    new_md = {
        **md,
        "last-sequence-number": seq,
        "last-updated-ms": ts_ms,
        "current-snapshot-id": snapshot_id,
        "snapshots": md["snapshots"] + [snapshot],
        "snapshot-log": md["snapshot-log"]
        + [{"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}],
        "metadata-log": md["metadata-log"]
        + [
            {
                "metadata-file": os.path.join(
                    meta_dir, f"v{v}.metadata.json"
                ),
                "timestamp-ms": md["last-updated-ms"],
            }
        ],
    }
    md_path = os.path.join(meta_dir, f"v{v + 1}.metadata.json")
    with open(md_path, "w") as f:
        json.dump(new_md, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(v + 1))
    return {
        "metadata": md_path,
        "snapshot_id": snapshot_id,
        "data_files": len(new_infos),
        "replaced_files": len(old_files),
        "rows": total_rows,
    }


def expire_iceberg_snapshots(table_dir: str, keep: int = 2) -> dict:
    """Keep the ``keep`` newest snapshots; drop the rest from the
    metadata log and delete manifest/manifest-list files referenced by
    NO surviving snapshot.  The table-format twin of the engine's
    keep-2 run-history retention (`state/checkpoint.gc_checkpoints`,
    mirroring the reference's keep-2-newest-Personalize-solutions
    policy, `create_personalize_solution/index.py:97-106`).  Data files
    are NOT deleted (an expired snapshot's files may be EXISTING in a
    survivor's manifests); writes vN+1 metadata."""
    md, v = _current_metadata(table_dir)
    meta_dir = os.path.join(table_dir, "metadata")
    snaps = sorted(md["snapshots"], key=lambda s: s["sequence-number"])
    if len(snaps) <= keep:
        return {"expired": 0, "removed_files": [], "metadata": None}
    keep_snaps = snaps[-keep:]
    keep_ids = {s["snapshot-id"] for s in keep_snaps}
    if md["current-snapshot-id"] not in keep_ids:
        raise ValueError("cannot expire the current snapshot")

    live: set[str] = set()
    for s in keep_snaps:
        live.add(os.path.abspath(s["manifest-list"]))
        _, mlist = read_avro_container(s["manifest-list"])
        live.update(os.path.abspath(m["manifest_path"]) for m in mlist)
    removed = []
    for s in snaps[:-keep]:
        candidates = [os.path.abspath(s["manifest-list"])]
        _, mlist = read_avro_container(s["manifest-list"])
        candidates.extend(
            os.path.abspath(m["manifest_path"]) for m in mlist
        )
        for p in candidates:
            if p not in live and os.path.exists(p):
                os.remove(p)
                removed.append(p)

    new_md = {
        **md,
        "snapshots": keep_snaps,
        "snapshot-log": [
            e for e in md["snapshot-log"] if e["snapshot-id"] in keep_ids
        ],
        "metadata-log": md["metadata-log"]
        + [
            {
                "metadata-file": os.path.join(
                    meta_dir, f"v{v}.metadata.json"
                ),
                "timestamp-ms": md["last-updated-ms"],
            }
        ],
    }
    md_path = os.path.join(meta_dir, f"v{v + 1}.metadata.json")
    with open(md_path, "w") as f:
        json.dump(new_md, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(v + 1))
    return {
        "expired": len(snaps) - keep,
        "removed_files": removed,
        "metadata": md_path,
    }


def read_iceberg_table(
    table_dir: str, snapshot_id: int | None = None
) -> "object":
    """Ray-side reader for tables this module writes (and any
    unpartitioned v2 table whose manifests use the null Avro codec):
    version-hint → vN.metadata.json → manifest list → live data files
    → ``ray.data.read_parquet`` over exactly those paths.  Pass
    ``snapshot_id`` for time travel to an earlier snapshot."""
    import ray.data

    md, _ = _current_metadata(table_dir)
    sid = snapshot_id if snapshot_id is not None else md["current-snapshot-id"]
    snap = next(
        (s for s in md["snapshots"] if s["snapshot-id"] == sid), None
    )
    if snap is None:
        raise ValueError(f"snapshot {sid} not in the metadata log")
    _, mlist = read_avro_container(snap["manifest-list"])
    files = []  # (path, partition dict)
    for m in mlist:
        _, entries = read_avro_container(m["manifest_path"])
        files.extend(
            (e["data_file"]["file_path"], e["data_file"]["partition"])
            for e in entries
            if e["status"] != 2  # not DELETED
        )
    if not files:
        raise ValueError("snapshot lists no live data files")

    spec = next(
        s for s in md["partition-specs"]
        if s["spec-id"] == md["default-spec-id"]
    )
    if not spec["fields"]:
        return ray.data.read_parquet(sorted(p for p, _ in files))

    # identity-partitioned: reconstitute the partition columns from the
    # manifest metadata (hive files do not contain them) — one read per
    # partition value, constant columns appended, union of the reads
    part_cols = [f["name"] for f in spec["fields"]]
    groups: dict[tuple, list[str]] = {}
    for p, part in files:
        groups.setdefault(tuple(part[c] for c in part_cols), []).append(p)

    pieces = []
    for values, paths in sorted(groups.items()):
        ds = ray.data.read_parquet(sorted(paths))

        def _attach(batch: "pa.Table", _v=values) -> "pa.Table":
            # ray.data.read_parquet may hive-infer the partition column
            # from the path (as string) — REPLACE it with the manifest's
            # typed value rather than duplicating the field
            for c, v in zip(part_cols, _v):
                arr = pa.array([v] * batch.num_rows)
                if c in batch.column_names:
                    batch = batch.set_column(
                        batch.schema.get_field_index(c), c, arr
                    )
                else:
                    batch = batch.append_column(c, arr)
            return batch

        pieces.append(ds.map_batches(_attach, batch_format="pyarrow"))
    return pieces[0].union(*pieces[1:]) if len(pieces) > 1 else pieces[0]


__all__ = [
    "freeze_iceberg_table",
    "append_iceberg_snapshot",
    "read_iceberg_table",
    "expire_iceberg_snapshots",
    "compact_iceberg_table",
    "manifest_entry_schema",
    "write_avro_container",
    "read_avro_container",
    "iceberg_schema_json",
    "MANIFEST_ENTRY_SCHEMA",
    "MANIFEST_FILE_SCHEMA",
]
