"""Learned item-affinity model: implicit-feedback ALS (Hu, Koren,
Volinsky, "Collaborative Filtering for Implicit Feedback Datasets",
ICDM 2008) — the trainable replacement for the transparent
co-occurrence stand-in in :mod:`.segments`.

The reference trains this as a managed `aws-item-affinity` recipe
(`lib/personalize.ts:91`, `lambda/create_personalize_solution/
index.py:36-45`) and scores segments with a batch job
(`lambda/create_personalize_segment/index.py:174-205`).  Here the
model itself is rebuilt Ray-Data-first:

Scale posture (the part that matters at 10^12 interactions):

- **Items are the small side** (a catalog: 1e5–1e8 rows × f floats).
  Item factors ``Y`` live on the driver and are broadcast once per
  sweep via ``ray.put`` — never re-shipped per batch.
- **Users are the unbounded side.**  User factors are NEVER
  materialized globally.  Each sweep hash-partitions the (user, item,
  cnt) table by user (so every user's rows are co-located), solves
  each user's f×f normal equations vectorized inside the partition,
  and emits per-item Gramian partials (A_i = Σ(c-1)·x xᵀ, b_i = Σc·x)
  FROM THE SAME PASS.  One shuffle per iteration, total.
- The driver sums |items| partial rows per partition (tiny) and does
  the |items| f×f solves locally.
- Segment scoring reuses the user-partition layout: a user's full
  item set is inside their partition, so "exclude prior purchasers"
  is a local mask — no anti-join shuffle.

Objective (per the paper): min Σ_ui c_ui (p_ui − x_uᵀy_i)² +
λ(Σ|x_u|² + Σ|y_i|²), with p_ui = 1 for observed pairs, 0 elsewhere,
and confidence c_ui = 1 + α·n_ui.  The unobserved cells are handled
by the YᵀY / XᵀX trick, not by enumerating them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..ops.relational import DEDUP_PARTITIONS, topn_per_group

_XTX_KEY = "\x00__xtx__"  # sorts before any real item id; never a real id


def user_item_counts(
    interactions, partitions: int = DEDUP_PARTITIONS
) -> "ray.data.Dataset":
    """(USER_ID, ITEM_ID, n, _part) — interaction counts, hash-
    partitioned by user.  Partial per-batch counts shrink the shuffle;
    the per-partition combine is vectorized pandas.  ``_part`` is kept
    so every downstream ALS sweep reuses the partitioning for free."""

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["USER_ID", "ITEM_ID"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["_part"] = (
            pd.util.hash_array(out["USER_ID"].to_numpy()) % partitions
        ).astype("int32")
        return out

    def _combine(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["USER_ID", "ITEM_ID", "_part"], sort=False)["n"]
            .sum()
            .reset_index()
        )

    return (
        interactions.select_columns(["USER_ID", "ITEM_ID"])
        .map_batches(_local, batch_format="pandas")
        .groupby("_part")
        .map_groups(_combine, batch_format="pandas")
    )


def _init_item_factors(items: list[str], factors: int, seed: int) -> pd.DataFrame:
    """Deterministic per-item init: each row is seeded by the item id
    itself (stable under catalog growth/reordering), scaled 1/√f so
    initial x·y predictions are O(1)."""
    rows = np.empty((len(items), factors))
    for k, it in enumerate(items):
        rng = np.random.default_rng(
            np.uint64(seed)
            ^ np.uint64(pd.util.hash_array(np.array([it], dtype=object))[0])
        )
        rows[k] = rng.standard_normal(factors)
    return pd.DataFrame({"item_id": items, "y": list(rows / np.sqrt(factors))})


def _solve_users(
    g: pd.DataFrame,
    y_map: dict,
    yty_reg: np.ndarray,
    alpha: float,
    factors: int,
):
    """Solve every user in a partition; returns (users, X, rows') where
    rows' carries each row's item id, confidence and user ordinal.
    Unknown items (cold start vs a fixed Y) are dropped."""
    g = g.sort_values(["USER_ID", "ITEM_ID"], kind="mergesort")
    g = g[g["ITEM_ID"].isin(y_map).to_numpy()]
    if not len(g):
        return np.empty(0, object), np.empty((0, factors)), g
    yrows = np.stack(g["ITEM_ID"].map(y_map).to_numpy())  # (rows, f)
    conf = 1.0 + alpha * g["n"].to_numpy(dtype=np.float64)
    users, starts = np.unique(g["USER_ID"].to_numpy(), return_index=True)
    bounds = np.append(starts, len(g))
    X = np.empty((len(users), factors))
    for u in range(len(users)):
        lo, hi = bounds[u], bounds[u + 1]
        Yu = yrows[lo:hi]
        cu = conf[lo:hi]
        A = yty_reg + (Yu * (cu - 1.0)[:, None]).T @ Yu
        b = (Yu * cu[:, None]).sum(axis=0)
        X[u] = np.linalg.solve(A, b)
    g = g.assign(_uord=np.repeat(np.arange(len(users)), np.diff(bounds)))
    return users, X, g


def _item_partials(
    g: pd.DataFrame, X: np.ndarray, alpha: float, factors: int
) -> pd.DataFrame:
    """Per-item partial sums emitted from a user partition:
    A_i += Σ_u (c_ui − 1)·x_u x_uᵀ, b_i += Σ_u c_ui·x_u, plus one
    ``_XTX_KEY`` row carrying the partition's XᵀX partial."""
    conf = 1.0 + alpha * g["n"].to_numpy(dtype=np.float64)
    xrows = X[g["_uord"].to_numpy()]  # (rows, f)
    outer = (xrows[:, :, None] * xrows[:, None, :]).reshape(len(g), factors * factors)
    a_part = outer * (conf - 1.0)[:, None]
    b_part = xrows * conf[:, None]
    items, inv = np.unique(g["ITEM_ID"].to_numpy(), return_inverse=True)
    agg_a = np.zeros((len(items), factors * factors))
    agg_b = np.zeros((len(items), factors))
    np.add.at(agg_a, inv, a_part)
    np.add.at(agg_b, inv, b_part)
    out = pd.DataFrame(
        {
            "item_id": np.append(items, _XTX_KEY),
            "A": list(np.vstack([agg_a, (X.T @ X).reshape(1, -1)])),
            "b": list(np.vstack([agg_b, np.zeros((1, factors))])),
        }
    )
    return out


def _sweep_partition(
    g: pd.DataFrame,
    y_map: dict,
    yty_reg: np.ndarray,
    alpha: float,
    factors: int,
) -> pd.DataFrame:
    """One ALS half-sweep over one user partition: solve the users,
    emit per-item Gramian partials tagged with the partition id (the
    driver combines partials in ascending ``_part`` order so the float
    accumulation is partition-ORDER-invariant — which is what lets the
    serial reference in :func:`als_train_local` reproduce the
    distributed result bit-for-bit)."""
    part = int(g["_part"].iloc[0]) if len(g) else -1
    users, X, g2 = _solve_users(g, y_map, yty_reg, alpha, factors)
    if not len(users):
        return pd.DataFrame(
            {"item_id": pd.Series(dtype=object), "A": [], "b": [],
             "_part": pd.Series(dtype="int32")}
        )
    out = _item_partials(g2, X, alpha, factors)
    out["_part"] = np.int32(part)
    return out


def _combine_partials(
    partial_frames: list, item_list: list, factors: int, reg: float
) -> pd.DataFrame:
    """Driver-side item solve from per-partition Gramian partials.
    Partials are summed in ascending ``_part`` order (stable), so the
    result is a pure function of the partition CONTENTS, independent
    of block arrival order."""
    eye = np.eye(factors)
    frames = [f for f in partial_frames if len(f)]
    acc_a: dict = {}
    acc_b: dict = {}
    xtx = np.zeros((factors, factors))
    if frames:
        allp = pd.concat(frames, ignore_index=True).sort_values(
            "_part", kind="mergesort"
        )
        for item, a_v, b_v in zip(allp["item_id"], allp["A"], allp["b"]):
            a_v = np.asarray(a_v)
            b_v = np.asarray(b_v)
            if item == _XTX_KEY:
                xtx += a_v.reshape(factors, factors)
                continue
            if item in acc_a:
                acc_a[item] += a_v
                acc_b[item] += b_v
            else:
                acc_a[item] = a_v.copy()
                acc_b[item] = b_v.copy()
    xtx_reg = xtx + reg * eye
    new_rows = []
    for item in item_list:
        if item in acc_a:
            A = xtx_reg + acc_a[item].reshape(factors, factors)
            new_rows.append(np.linalg.solve(A, acc_b[item]))
        else:
            new_rows.append(np.zeros(factors))
    return pd.DataFrame({"item_id": item_list, "y": new_rows})


def als_train(
    interactions,
    factors: int = 16,
    iterations: int = 8,
    alpha: float = 40.0,
    reg: float = 0.1,
    seed: int = 7,
    partitions: int = DEDUP_PARTITIONS,
) -> pd.DataFrame:
    """Train implicit ALS; returns the item-factor table
    ``(item_id, y: list<float64>)`` — the small, driver-resident side.
    User factors are an artifact of each sweep and are recomputed
    against the final ``Y`` by the scoring passes (guaranteeing x/y
    consistency without ever materializing them)."""
    ui = user_item_counts(interactions, partitions).materialize()

    # item vocabulary: streamed per-batch uniques, driver set-union
    items: set = set()
    for b in ui.select_columns(["ITEM_ID"]).iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        items.update(b["ITEM_ID"].unique().tolist())
    item_list = sorted(items)
    Y = _init_item_factors(item_list, factors, seed)

    eye = np.eye(factors)
    for _ in range(iterations):
        y_map = dict(zip(Y["item_id"], Y["y"]))
        ymat = np.stack(Y["y"].to_numpy())
        yty_reg = ymat.T @ ymat + reg * eye
        ref = ray.put((y_map, yty_reg))

        def _sweep(g: pd.DataFrame) -> pd.DataFrame:
            y_map_l, yty_l = ray.get(ref)
            return _sweep_partition(g, y_map_l, yty_l, alpha, factors)

        # driver combine: ≤ partitions × |items| tiny rows
        Y = _combine_partials(
            list(
                ui.groupby("_part")
                .map_groups(_sweep, batch_format="pandas")
                .iter_batches(batch_size=None, batch_format="pandas")
            ),
            item_list,
            factors,
            reg,
        )
    return Y


def als_user_factors(
    interactions,
    item_factors: pd.DataFrame,
    alpha: float = 40.0,
    reg: float = 0.1,
    partitions: int = DEDUP_PARTITIONS,
) -> "ray.data.Dataset":
    """(USER_ID, x: list<float64>) as a streaming Dataset — the
    unbounded side, never collected here."""
    factors = len(item_factors["y"].iloc[0])
    ymat = np.stack(item_factors["y"].to_numpy())
    ref = ray.put(
        (dict(zip(item_factors["item_id"], item_factors["y"])),
         ymat.T @ ymat + reg * np.eye(factors))
    )
    ui = user_item_counts(interactions, partitions)

    def _solve(g: pd.DataFrame) -> pd.DataFrame:
        y_map, yty_reg = ray.get(ref)
        users, X, _ = _solve_users(g, y_map, yty_reg, alpha, factors)
        return pd.DataFrame({"USER_ID": users, "x": list(X)})

    return ui.groupby("_part").map_groups(_solve, batch_format="pandas")


def als_item_based_segments(
    interactions,
    target_items: list[str],
    n: int = 100,
    factors: int = 16,
    iterations: int = 8,
    alpha: float = 40.0,
    reg: float = 0.1,
    seed: int = 7,
    partitions: int = DEDUP_PARTITIONS,
    item_factors: pd.DataFrame | None = None,
) -> "ray.data.Dataset":
    """Batch segment job on the LEARNED model: top-``n`` users per
    target item by x_u·y_t, prior purchasers excluded.  Output
    ``(item_id, user_id, affinity)`` — same schema as the transparent
    :func:`.segments.item_based_segments`.

    One scoring pass: users are solved against the final ``Y`` inside
    their hash partition; ownership exclusion is a local mask (the
    partition holds the user's whole item set); only the global
    top-n-per-target shuffle touches the scored rows, and those are
    pre-capped to the per-partition top-n."""
    if item_factors is None:
        item_factors = als_train(
            interactions, factors, iterations, alpha, reg, seed, partitions
        )
    factors = len(item_factors["y"].iloc[0])
    tgt = [t for t in target_items if (item_factors["item_id"] == t).any()]
    tmat = np.stack(
        item_factors.set_index("item_id").loc[tgt, "y"].to_numpy()
    ) if tgt else np.zeros((0, factors))
    ymat = np.stack(item_factors["y"].to_numpy())
    ref = ray.put(
        (dict(zip(item_factors["item_id"], item_factors["y"])),
         ymat.T @ ymat + reg * np.eye(factors), tgt, tmat)
    )
    ui = user_item_counts(interactions, partitions)

    def _score(g: pd.DataFrame) -> pd.DataFrame:
        y_map, yty_reg, tgt_l, tmat_l = ray.get(ref)
        return _score_partition(
            g, y_map, yty_reg, tgt_l, tmat_l, alpha, factors, n
        )

    scored = ui.groupby("_part").map_groups(_score, batch_format="pandas")
    return topn_per_group(
        scored, "item_id", "affinity", n, descending=True, tiebreak=["user_id"]
    )


def _score_partition(
    g: pd.DataFrame,
    y_map: dict,
    yty_reg: np.ndarray,
    tgt_l: list,
    tmat_l: np.ndarray,
    alpha: float,
    factors: int,
    n: int,
) -> pd.DataFrame:
    """Score one user partition against the target items (shared by the
    distributed map_groups closure and the serial reference)."""
    empty = pd.DataFrame(
        {
            "item_id": pd.Series(dtype=object),
            "user_id": pd.Series(dtype=object),
            "affinity": pd.Series(dtype=np.float64),
        }
    )
    if not len(tgt_l):
        return empty
    users, X, g2 = _solve_users(g, y_map, yty_reg, alpha, factors)
    if not len(users):
        return empty
    scores = X @ tmat_l.T  # (users, targets)
    # local ownership mask: user's full item set is in this partition
    tpos = {t: k for k, t in enumerate(tgt_l)}
    owned_rows = g2[g2["ITEM_ID"].isin(tpos)]
    scores[
        owned_rows["_uord"].to_numpy(),
        owned_rows["ITEM_ID"].map(tpos).to_numpy(),
    ] = -np.inf
    uu, tt = np.nonzero(np.isfinite(scores))
    out = pd.DataFrame(
        {
            "item_id": np.asarray(tgt_l, object)[tt],
            "user_id": users[uu],
            "affinity": scores[uu, tt],
        }
    )
    # per-partition pre-cap: global top-n ⊆ union of partition top-n
    out = out.sort_values(
        ["item_id", "affinity", "user_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    return out.groupby("item_id", sort=False).head(n)


# ---------------------------------------------------------------------------
# Serial reference (oracle-fixture generator)
# ---------------------------------------------------------------------------

def user_item_counts_local(
    df: pd.DataFrame, partitions: int = DEDUP_PARTITIONS
) -> pd.DataFrame:
    """Plain-pandas mirror of :func:`user_item_counts` (identical
    counts + ``_part`` assignment; no Ray)."""
    out = (
        df.groupby(["USER_ID", "ITEM_ID"], sort=False)
        .size()
        .reset_index(name="n")
    )
    out["_part"] = (
        pd.util.hash_array(out["USER_ID"].to_numpy()) % partitions
    ).astype("int32")
    return out


def als_train_local(
    interactions_df: pd.DataFrame,
    factors: int = 16,
    iterations: int = 8,
    alpha: float = 40.0,
    reg: float = 0.1,
    seed: int = 7,
    partitions: int = DEDUP_PARTITIONS,
) -> pd.DataFrame:
    """Serial reference for :func:`als_train`: same partition layout,
    same per-partition kernels, same ascending-``_part`` combine —
    bit-identical item factors (asserted by tests/test_affinity.py).
    Exists so the driver's oracle gate can pin the iterative model's
    output as a fixture without running Ray."""
    ui = user_item_counts_local(interactions_df, partitions)
    item_list = sorted(ui["ITEM_ID"].unique().tolist())
    Y = _init_item_factors(item_list, factors, seed)
    eye = np.eye(factors)
    for _ in range(iterations):
        y_map = dict(zip(Y["item_id"], Y["y"]))
        ymat = np.stack(Y["y"].to_numpy())
        yty_reg = ymat.T @ ymat + reg * eye
        frames = [
            _sweep_partition(g, y_map, yty_reg, alpha, factors)
            for _, g in ui.groupby("_part", sort=True)
        ]
        Y = _combine_partials(frames, item_list, factors, reg)
    return Y


def als_item_based_segments_local(
    interactions_df: pd.DataFrame,
    target_items: list,
    n: int = 100,
    factors: int = 16,
    iterations: int = 8,
    alpha: float = 40.0,
    reg: float = 0.1,
    seed: int = 7,
    partitions: int = DEDUP_PARTITIONS,
    item_factors: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Serial reference for :func:`als_item_based_segments` (same
    kernels per partition, same global top-n semantics as
    ``topn_per_group``)."""
    if item_factors is None:
        item_factors = als_train_local(
            interactions_df, factors, iterations, alpha, reg, seed, partitions
        )
    factors = len(item_factors["y"].iloc[0])
    tgt = [t for t in target_items if (item_factors["item_id"] == t).any()]
    tmat = np.stack(
        item_factors.set_index("item_id").loc[tgt, "y"].to_numpy()
    ) if tgt else np.zeros((0, factors))
    ymat = np.stack(item_factors["y"].to_numpy())
    y_map = dict(zip(item_factors["item_id"], item_factors["y"]))
    yty_reg = ymat.T @ ymat + reg * np.eye(factors)
    ui = user_item_counts_local(interactions_df, partitions)
    parts = [
        _score_partition(g, y_map, yty_reg, tgt, tmat, alpha, factors, n)
        for _, g in ui.groupby("_part", sort=True)
    ]
    scored = pd.concat(parts, ignore_index=True) if parts else parts
    if not len(scored):
        return _score_partition(
            ui.iloc[:0], y_map, yty_reg, [], tmat, alpha, factors, n
        )
    out = scored.sort_values(
        ["item_id", "affinity", "user_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    return out.groupby("item_id", sort=False).head(n).reset_index(drop=True)


__all__ = [
    "user_item_counts",
    "als_train",
    "als_user_factors",
    "als_item_based_segments",
    "user_item_counts_local",
    "als_train_local",
    "als_item_based_segments_local",
]
