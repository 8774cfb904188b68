"""Deterministic customer-360 fixture: the reference's test corpus shape.

Mirrors `/root/reference/dbloader/gen_testdata.py` semantics (FIXTURES.md
§3) while deriving everything from the driver's TPC-H-ish tables so no
data is invented wholesale:

- ``customer_master``: one row per driver ``customer.c_custkey`` —
  email / firstname / lastname / gender / age / created_at are pure
  functions of the key (per-row seeded generator, identical on every
  worker and run).
- ``subbrand_customer_master``: 50% planted duplicates (same email,
  name, gender, age; fresh customer_id and created_at —
  `gen_testdata.py:18,493-504`), ~2% same-name different-person
  confounders distinguishable by age/email (`:398-417`), plus true
  non-matches with distinct ``.sub@example.com`` emails (`:510`).
- ``purchase_history`` / ``subbrand_purchase_history``: deterministic
  purchases per customer; ~30% of duplicated persons cross-purchase
  (`cross_purchase_ratio`, `:20,548`).
- ``customer_relations``: ground-truth (subbrand_customer_id,
  main_customer_id) pairs (`:578-592,647`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

EPOCH = 1_704_067_200

_FIRST = [
    "alice", "bob", "carol", "david", "emma", "frank", "grace", "henry",
    "iris", "jack", "kate", "liam", "mia", "noah", "olivia", "peter",
    "quinn", "rosa", "sam", "tara", "uma", "victor", "wendy", "xavier",
]
_LAST = [
    "anderson", "brown", "chen", "davis", "evans", "fischer", "garcia",
    "hughes", "ito", "jones", "kim", "lopez", "miller", "nguyen",
    "olsen", "patel", "quirk", "rossi", "smith", "tanaka", "ueda",
    "vargas", "wong", "young",
]
_GENDERS = ["male", "female", "unknown"]

N_ITEMS_MAIN = 500
N_ITEMS_SUB = 200
PURCHASES_PER_CUSTOMER = 3


def _person(k: int) -> dict:
    rng = np.random.default_rng([11, k])
    first = _FIRST[int(rng.integers(len(_FIRST)))]
    last = _LAST[int(rng.integers(len(_LAST)))]
    return {
        "firstname": first,
        "lastname": last,
        "gender": _GENDERS[int(rng.integers(3))],
        "age": int(rng.integers(18, 81)),
        "email": f"{first}.{last}_{k}@example.com",
    }


def _main_id(k: int) -> str:
    return f"main-{k:08d}"


def _sub_id(k: int, kind: str) -> str:
    return f"sub-{kind}-{k:08d}"


_CUSTOMER_SCHEMA = pa.schema(
    [
        ("customer_id", pa.string()),
        ("email", pa.string()),
        ("firstname", pa.string()),
        ("lastname", pa.string()),
        ("gender", pa.string()),
        ("age", pa.int64()),
        ("created_at", pa.int64()),
    ]
)


def _rows_to_table(rows: list[dict]) -> pa.Table:
    cols = {f.name: [r[f.name] for r in rows] for f in _CUSTOMER_SCHEMA}
    return pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in _CUSTOMER_SCHEMA}
    )


def _custkeys(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )


def expand_customer_master(batch: pa.Table) -> pa.Table:
    """Pure batch expander (c_custkey → main master rows) — shared by
    the Ray source below and the oracle fixture-parquet export."""
    rows = []
    for k in batch["c_custkey"].to_pylist():
        p = _person(k)
        rows.append({"customer_id": _main_id(k), "created_at": EPOCH + k, **p})
    return _rows_to_table(rows)


def customer_master(sf_dir: str) -> "ray.data.Dataset":
    return _custkeys(sf_dir).map_batches(
        expand_customer_master, batch_format="pyarrow"
    )


def expand_subbrand_master(batch: pa.Table) -> pa.Table:
    """50% duplicates of main, ~2% confounders, rest distinct persons."""
    rows = []
    for k in batch["c_custkey"].to_pylist():
        if k % 2 == 0:  # planted duplicate: same identity fields
            p = _person(k)
            rows.append(
                {
                    "customer_id": _sub_id(k, "dup"),
                    "created_at": EPOCH + 500_000 + k,
                    **p,
                }
            )
        elif k % 50 == 1:  # confounder: same name, different person
            p = _person(k)
            rng = np.random.default_rng([13, k])
            p["age"] = int((p["age"] - 18 + 7 + rng.integers(5, 40)) % 63 + 18)
            p["email"] = f"{p['firstname']}.{p['lastname']}_{k}.sub@example.com"
            rows.append(
                {
                    "customer_id": _sub_id(k, "conf"),
                    "created_at": EPOCH + 600_000 + k,
                    **p,
                }
            )
        else:  # true non-match: a distinct person
            p = _person(10_000_000 + k)
            p["email"] = f"{p['firstname']}.{p['lastname']}_{k}.sub@example.com"
            rows.append(
                {
                    "customer_id": _sub_id(k, "new"),
                    "created_at": EPOCH + 700_000 + k,
                    **p,
                }
            )
    return _rows_to_table(rows)


def subbrand_customer_master(sf_dir: str) -> "ray.data.Dataset":
    return _custkeys(sf_dir).map_batches(
        expand_subbrand_master, batch_format="pyarrow"
    )


def expand_relations(batch: pa.Table) -> pa.Table:
    """Ground truth: one row per planted duplicate."""
    subs, mains = [], []
    for k in batch["c_custkey"].to_pylist():
        if k % 2 == 0:
            subs.append(_sub_id(k, "dup"))
            mains.append(_main_id(k))
    return pa.table(
        {
            "subbrand_customer_id": pa.array(subs, pa.string()),
            "main_customer_id": pa.array(mains, pa.string()),
        }
    )


def customer_relations(sf_dir: str) -> "ray.data.Dataset":
    return _custkeys(sf_dir).map_batches(expand_relations, batch_format="pyarrow")


def _purchases(batch: pa.Table, sub: bool) -> pa.Table:
    cust, item, date = [], [], []
    for k in batch["c_custkey"].to_pylist():
        if sub:
            # subbrand purchasers: every subbrand customer buys; 30% of
            # duplicated persons cross-purchase under their sub identity
            if k % 2 == 0 and k % 10 >= 3:  # 70% of dups don't purchase sub
                continue
            kind = "dup" if k % 2 == 0 else ("conf" if k % 50 == 1 else "new")
            cid = _sub_id(k, kind)
            n_items = N_ITEMS_SUB
            tag = "sub"
        else:
            cid = _main_id(k)
            n_items = N_ITEMS_MAIN
            tag = "main"
        rng = np.random.default_rng([17 if sub else 19, k])
        for j in range(PURCHASES_PER_CUSTOMER):
            cust.append(cid)
            item.append(str(int(rng.integers(1, n_items + 1))))
            date.append(EPOCH + int(rng.integers(0, 365 * 86400)))
        _ = tag
    return pa.table(
        {
            "customer_id": pa.array(cust, pa.string()),
            "item_id": pa.array(item, pa.string()),
            "purchase_date": pa.array(date, pa.int64()),
        }
    )


def purchase_history(sf_dir: str) -> "ray.data.Dataset":
    return _custkeys(sf_dir).map_batches(
        lambda b: _purchases(b, sub=False), batch_format="pyarrow"
    )


def subbrand_purchase_history(sf_dir: str) -> "ray.data.Dataset":
    return _custkeys(sf_dir).map_batches(
        lambda b: _purchases(b, sub=True), batch_format="pyarrow"
    )


__all__ = [
    "customer_master",
    "subbrand_customer_master",
    "customer_relations",
    "purchase_history",
    "subbrand_purchase_history",
]
