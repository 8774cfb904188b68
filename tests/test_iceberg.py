"""Iceberg v2 metadata-log emitter (ops/iceberg.py, SURVEY §2 S8).

The container has no Avro library and no Iceberg reader, so the writer
is validated three ways: (1) an INDEPENDENT in-repo binary decoder
round-trips the container files, (2) spec-level byte assertions (magic,
zigzag varints, sync markers), (3) metadata.json field checks against
the public TableMetadata spec, with counts cross-checked against the
Parquet footers the manifest claims to describe.
"""
import glob
import json
import os
import shutil
import struct

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import iceberg


def test_zigzag_varint_spec_values():
    # examples straight from the Avro spec's encoding table
    assert iceberg._zigzag(0) == b"\x00"
    assert iceberg._zigzag(-1) == b"\x01"
    assert iceberg._zigzag(1) == b"\x02"
    assert iceberg._zigzag(-2) == b"\x03"
    assert iceberg._zigzag(64) == b"\x80\x01"
    assert iceberg._zigzag(-65) == b"\x81\x01"


def test_avro_container_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
            {"name": "c", "type": {"type": "array", "items": "int"}},
            {"name": "d", "type": {"type": "map", "values": "double"}},
            {"name": "e", "type": "boolean"},
            {"name": "f", "type": "bytes"},
        ],
    }
    records = [
        {"a": -7, "b": None, "c": [1, 2, 3], "d": {"x": 1.5}, "e": True,
         "f": b"\x00\xff"},
        {"a": 2**40, "b": "héllo", "c": [], "d": {}, "e": False, "f": b""},
    ]
    p = str(tmp_path / "t.avro")
    iceberg.write_avro_container(p, schema, records, b"0123456789abcdef")
    got_schema, got = iceberg.read_avro_container(p)
    assert got_schema == schema
    assert got == records
    # spec bytes: magic + eventually the sync marker twice
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    assert raw.count(b"0123456789abcdef") == 2


def test_freeze_iceberg_table_roundtrip(tmp_path):
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    df = pd.DataFrame(
        {
            "k": range(100),
            "v": [f"s{i}" for i in range(100)],
            "ts": pd.date_range("2025-01-01", periods=100, freq="h"),
        }
    )
    ray.data.from_pandas(df).repartition(3).write_parquet(data)
    out = iceberg.freeze_iceberg_table(table, snapshot_ts_ms=1700000000000)

    # ---- metadata.json: spec-required TableMetadata fields
    md = json.load(open(out["metadata"]))
    assert md["format-version"] == 2
    assert md["current-snapshot-id"] == out["snapshot_id"]
    assert md["schemas"][0]["fields"][0]["name"] == "k"
    assert md["partition-specs"] == [{"spec-id": 0, "fields": []}]
    snap = md["snapshots"][0]
    assert snap["manifest-list"] == os.path.abspath(out["manifest_list"])
    assert snap["summary"]["operation"] == "append"
    assert open(os.path.join(table, "metadata", "version-hint.text")).read() == "1"

    # ---- manifest list → manifest → data files, via the independent reader
    _, mlist = iceberg.read_avro_container(out["manifest_list"])
    assert len(mlist) == 1
    m = mlist[0]
    assert m["manifest_path"] == os.path.abspath(out["manifest"])
    assert m["manifest_length"] == os.path.getsize(out["manifest"])
    assert m["added_snapshot_id"] == out["snapshot_id"]
    assert m["added_rows_count"] == 100

    _, entries = iceberg.read_avro_container(out["manifest"])
    assert len(entries) == len(glob.glob(os.path.join(data, "*.parquet")))
    assert all(e["status"] == 1 for e in entries)
    assert sum(e["data_file"]["record_count"] for e in entries) == 100
    for e in entries:
        f = e["data_file"]
        assert os.path.exists(f["file_path"])
        assert f["file_size_in_bytes"] == os.path.getsize(f["file_path"])
        assert f["file_format"] == "PARQUET"

    # ---- deterministic re-freeze: identical bytes at fixed timestamp
    before = {
        p: open(p, "rb").read()
        for p in glob.glob(os.path.join(table, "metadata", "*"))
    }
    iceberg.freeze_iceberg_table(table, snapshot_ts_ms=1700000000000)
    for p, b in before.items():
        assert open(p, "rb").read() == b, p


def test_iceberg_schema_mapping_ids_unique():
    schema = pa.schema(
        [
            ("a", pa.int64()),
            ("b", pa.string()),
            ("c", pa.list_(pa.float64())),
            ("d", pa.struct([("x", pa.int32()), ("y", pa.timestamp("us"))])),
            ("e", pa.bool_()),
        ]
    )
    js, last_id = iceberg.iceberg_schema_json(schema)

    ids = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                for f in t["fields"]:
                    ids.append(f["id"])
                    walk(f["type"])
            elif t.get("type") == "list":
                ids.append(t["element-id"])
                walk(t["element"])

    walk(js)
    assert len(ids) == len(set(ids)) == last_id
    by_name = {f["name"]: f["type"] for f in js["fields"]}
    assert by_name["a"] == "long"
    assert by_name["c"]["element"] == "double"
    assert by_name["d"]["fields"][1]["type"] == "timestamp"


def test_freeze_rejects_empty_dir(tmp_path):
    os.makedirs(tmp_path / "data")
    with pytest.raises(ValueError):
        iceberg.freeze_iceberg_table(str(tmp_path))


def test_append_snapshot_and_read_back(tmp_path):
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    df1 = pd.DataFrame({"k": range(50), "v": ["a"] * 50})
    ray.data.from_pandas(df1).repartition(2).write_parquet(data)
    iceberg.freeze_iceberg_table(table, snapshot_ts_ms=1700000000000)
    first_md = json.load(
        open(os.path.join(table, "metadata", "v1.metadata.json"))
    )
    first_snap = first_md["current-snapshot-id"]

    # append a second batch of files
    delta = os.path.join(table, "data_delta")
    os.makedirs(delta)
    df2 = pd.DataFrame({"k": range(50, 80), "v": ["b"] * 30})
    ray.data.from_pandas(df2).repartition(1).write_parquet(delta)
    out2 = iceberg.append_iceberg_snapshot(
        table,
        glob.glob(os.path.join(delta, "*.parquet")),
        snapshot_ts_ms=1700000100000,
    )

    md2, v = iceberg._current_metadata(table)
    assert v == 2
    assert md2["current-snapshot-id"] == out2["snapshot_id"]
    assert len(md2["snapshots"]) == 2
    snap2 = md2["snapshots"][1]
    assert snap2["parent-snapshot-id"] == first_snap
    assert snap2["summary"]["total-records"] == "80"

    # the new manifest list carries the prior manifest as EXISTING
    _, mlist = iceberg.read_avro_container(out2["manifest_list"])
    assert len(mlist) == 2
    assert mlist[0]["added_rows_count"] == 30
    assert mlist[1]["existing_rows_count"] == 50
    assert mlist[1]["added_rows_count"] == 0

    # Ray-side read: current snapshot = 80 rows; time travel = 50
    full = iceberg.read_iceberg_table(table).to_pandas()
    assert len(full) == 80 and sorted(full["k"]) == list(range(80))
    old = iceberg.read_iceberg_table(table, snapshot_id=first_snap)
    assert old.count() == 50


def test_partitioned_freeze_append_read(tmp_path):
    """Identity-partitioned table: write_parquet(partition_cols) hive
    layout → freeze with partition_by → the manifest carries typed
    partition values per file, the schema/spec declare the identity
    fields, and read_iceberg_table reconstitutes the partition column
    from METADATA (hive files don't contain it)."""
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    df = pd.DataFrame(
        {"k": range(60), "lang": ["en", "de", "fr"] * 20}
    )
    ray.data.from_pandas(df).repartition(2).write_parquet(
        data, partition_cols=["lang"]
    )
    out = iceberg.freeze_iceberg_table(
        table, partition_by=["lang"], snapshot_ts_ms=1700000000000
    )

    md = json.load(open(out["metadata"]))
    spec = md["partition-specs"][0]
    assert spec["fields"][0]["transform"] == "identity"
    assert spec["fields"][0]["name"] == "lang"
    src = spec["fields"][0]["source-id"]
    schema_field = next(
        f for f in md["schemas"][0]["fields"] if f["id"] == src
    )
    assert schema_field["name"] == "lang" and schema_field["type"] == "string"

    _, entries = iceberg.read_avro_container(out["manifest"])
    assert {e["data_file"]["partition"]["lang"] for e in entries} == {
        "en", "de", "fr"
    }

    full = iceberg.read_iceberg_table(table).to_pandas()
    assert len(full) == 60
    assert sorted(full["lang"].unique()) == ["de", "en", "fr"]
    assert full.groupby("lang")["k"].count().tolist() == [20, 20, 20]
    # values round-trip exactly: k mod 3 encodes the lang it was written with
    langs = {0: "en", 1: "de", 2: "fr"}
    assert all(langs[k % 3] == l for k, l in zip(full["k"], full["lang"]))

    # append a delta partition (hive dir) as snapshot 2
    delta = os.path.join(table, "delta", "lang=it")
    os.makedirs(delta)
    ray.data.from_pandas(
        pd.DataFrame({"k": range(100, 110)})
    ).repartition(1).write_parquet(delta)
    iceberg.append_iceberg_snapshot(
        table,
        glob.glob(os.path.join(delta, "*.parquet")),
        snapshot_ts_ms=1700000100000,
    )
    full2 = iceberg.read_iceberg_table(table).to_pandas()
    assert len(full2) == 70
    assert (full2[full2["lang"] == "it"]["k"] >= 100).all()


def test_partitioned_freeze_int_partition_values(tmp_path):
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    df = pd.DataFrame({"v": range(40), "year": [2024] * 20 + [2025] * 20})
    ray.data.from_pandas(df).repartition(1).write_parquet(
        data, partition_cols=["year"]
    )
    out = iceberg.freeze_iceberg_table(
        table, partition_by=["year"], snapshot_ts_ms=1700000000000
    )
    _, entries = iceberg.read_avro_container(out["manifest"])
    vals = {e["data_file"]["partition"]["year"] for e in entries}
    assert vals == {2024, 2025}  # typed long, not '2024'/'2025' strings
    back = iceberg.read_iceberg_table(table).to_pandas()
    assert back["year"].dtype.kind == "i"
    assert back.groupby("year")["v"].count().tolist() == [20, 20]


def test_expire_snapshots_keep2(tmp_path):
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    ray.data.from_pandas(pd.DataFrame({"k": range(10)})).repartition(
        1
    ).write_parquet(data)
    iceberg.freeze_iceberg_table(table, snapshot_ts_ms=1700000000000)
    for i in range(3):  # three appends → 4 snapshots
        d = os.path.join(table, f"delta{i}")
        os.makedirs(d)
        ray.data.from_pandas(
            pd.DataFrame({"k": range(10 * (i + 2), 10 * (i + 3))})
        ).repartition(1).write_parquet(d)
        iceberg.append_iceberg_snapshot(
            table, glob.glob(os.path.join(d, "*.parquet")),
            snapshot_ts_ms=1700000000000 + (i + 1) * 1000,
        )
    md, v = iceberg._current_metadata(table)
    assert len(md["snapshots"]) == 4 and v == 4

    out = iceberg.expire_iceberg_snapshots(table, keep=2)
    assert out["expired"] == 2
    md2, v2 = iceberg._current_metadata(table)
    assert v2 == 5 and len(md2["snapshots"]) == 2
    assert md2["current-snapshot-id"] == md["current-snapshot-id"]
    # removed manifests are gone; surviving snapshots still read fine
    for p in out["removed_files"]:
        assert not os.path.exists(p)
    assert iceberg.read_iceberg_table(table).count() == 40
    older = md2["snapshots"][0]["snapshot-id"]
    assert iceberg.read_iceberg_table(table, snapshot_id=older).count() == 30
    # idempotent below the threshold
    assert iceberg.expire_iceberg_snapshots(table, keep=2)["expired"] == 0


def test_compact_replace_snapshot(tmp_path):
    """Compaction: N small files → 1, operation=replace, old files
    DELETED (status 2) in the new manifest so the reader skips them;
    prior snapshot still reads the original layout (time travel)."""
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    ray.data.from_pandas(pd.DataFrame({"k": range(90)})).repartition(
        6
    ).write_parquet(data)
    iceberg.freeze_iceberg_table(table, snapshot_ts_ms=1700000000000)
    md1, _ = iceberg._current_metadata(table)
    first = md1["current-snapshot-id"]

    out = iceberg.compact_iceberg_table(
        table, target_file_rows=1000, snapshot_ts_ms=1700000100000
    )
    assert out["data_files"] == 1 and out["replaced_files"] == 6
    md2, v = iceberg._current_metadata(table)
    assert v == 2
    snap = md2["snapshots"][-1]
    assert snap["summary"]["operation"] == "replace"
    assert snap["summary"]["total-data-files"] == "1"

    # reader: current = 1 compacted file, same rows; DELETED skipped
    cur = iceberg.read_iceberg_table(table).to_pandas()
    assert sorted(cur["k"]) == list(range(90))
    _, entries = iceberg.read_avro_container(
        os.path.join(table, "metadata", f"snap-{out['snapshot_id']}-m0.avro")
    )
    assert sum(1 for e in entries if e["status"] == 2) == 6
    # time travel to the pre-compaction snapshot still works
    old = iceberg.read_iceberg_table(table, snapshot_id=first).to_pandas()
    assert sorted(old["k"]) == list(range(90))


def test_compact_rejects_partitioned(tmp_path):
    table = str(tmp_path / "tbl")
    data = os.path.join(table, "data")
    os.makedirs(data)
    df = pd.DataFrame({"k": range(20), "lang": ["en", "de"] * 10})
    ray.data.from_pandas(df).repartition(1).write_parquet(
        data, partition_cols=["lang"]
    )
    iceberg.freeze_iceberg_table(
        table, partition_by=["lang"], snapshot_ts_ms=1700000000000
    )
    with pytest.raises(NotImplementedError):
        iceberg.compact_iceberg_table(table)


def test_manifest_container_carries_spec_required_meta(tmp_path):
    """Iceberg spec: manifest files must carry schema / schema-id /
    partition-spec / partition-spec-id / format-version / content in
    the Avro container header, and manifest lists snapshot-id /
    parent-snapshot-id / sequence-number / format-version — external
    readers (pyiceberg, Spark, Trino) read the spec from the header,
    not from metadata.json."""
    data_dir = str(tmp_path / "t" / "data")
    os.makedirs(data_dir)
    pa_tbl = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    import pyarrow.parquet as pq

    pq.write_table(pa_tbl, os.path.join(data_dir, "part-0.parquet"))
    out = iceberg.freeze_iceberg_table(str(tmp_path / "t"))

    mmeta = iceberg.read_avro_meta(out["manifest"])
    for k in (
        "schema", "schema-id", "partition-spec", "partition-spec-id",
        "format-version", "content",
    ):
        assert k in mmeta, f"manifest header missing {k!r}"
    assert mmeta["format-version"] == "2"
    assert mmeta["content"] == "data"
    assert mmeta["partition-spec-id"] == "0"
    sch = json.loads(mmeta["schema"])
    assert [f["name"] for f in sch["fields"]] == ["k", "v"]
    assert json.loads(mmeta["partition-spec"]) == []

    lmeta = iceberg.read_avro_meta(out["manifest_list"])
    assert lmeta["snapshot-id"] == str(out["snapshot_id"])
    assert lmeta["parent-snapshot-id"] == "null"
    assert lmeta["sequence-number"] == "1"
    assert lmeta["format-version"] == "2"

    # append: new manifest + list carry the keys; parent id chains
    pq.write_table(
        pa.table({"k": [4], "v": ["d"]}),
        os.path.join(data_dir, "part-1.parquet"),
    )
    ap = iceberg.append_iceberg_snapshot(
        str(tmp_path / "t"), [os.path.join(data_dir, "part-1.parquet")]
    )
    m2 = iceberg.read_avro_meta(ap["manifest"])
    assert m2["content"] == "data" and "schema" in m2
    l2 = iceberg.read_avro_meta(ap["manifest_list"])
    assert l2["snapshot-id"] == str(ap["snapshot_id"])
    assert l2["parent-snapshot-id"] == str(out["snapshot_id"])
    assert l2["sequence-number"] == "2"


def test_partitioned_manifest_meta_spec_fields(tmp_path):
    """Partitioned freeze: the container header's partition-spec must
    name the identity fields with their source/field ids."""
    import pyarrow.parquet as pq

    data_dir = str(tmp_path / "t" / "data")
    for g in ("x", "y"):
        d = os.path.join(data_dir, f"g={g}")
        os.makedirs(d)
        pq.write_table(pa.table({"v": [1, 2]}), os.path.join(d, "f.parquet"))
    out = iceberg.freeze_iceberg_table(
        str(tmp_path / "t"), partition_by=["g"]
    )
    spec = json.loads(iceberg.read_avro_meta(out["manifest"])["partition-spec"])
    assert [f["name"] for f in spec] == ["g"]
    assert spec[0]["transform"] == "identity"
    assert spec[0]["field-id"] == 1000
