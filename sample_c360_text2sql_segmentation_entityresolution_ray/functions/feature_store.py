"""Zero-copy broadcast feature table for the slim-shuffle match plan.

A plain ``{url: (arrays...)}`` dict in the object store must be
re-PICKLED/unpickled on every task's ``ray.get`` — ~90 MB of Python
object graph per task at 66k records (measured as the dominant gate
cost).  This store keeps everything in a handful of flat numpy arrays:
Ray's serializer ships those out-of-band, so ``ray.get`` is a
zero-copy view and per-task overhead is microseconds.

Lookup is by 64-bit url hash (searchsorted on the sorted hash array).
A hash collision would read another record's features — probability
~n²/2⁶⁴ (≈1e-9 at 1M records), noise against the match threshold, and
the broadcast path is size-capped anyway.
"""

from __future__ import annotations

import numpy as np

from .texthash import hash_str_array


class FeatureStore:
    def __init__(
        self,
        key_hashes: np.ndarray,   # sorted uint64
        sh_off: np.ndarray,       # int64, len n+1
        sh_val: np.ndarray,       # uint32
        sh2_off: np.ndarray,
        sh2_val: np.ndarray,
        mh8: np.ndarray,          # (n, num_perm) uint8
        urls_b: np.ndarray | None = None,   # fixed-width bytes (S dtype)
        slugs_b: np.ndarray | None = None,  # fixed-width bytes (S dtype)
    ):
        self.key_hashes = key_hashes
        self.sh_off = sh_off
        self.sh_val = sh_val
        self.sh2_off = sh2_off
        self.sh2_val = sh2_val
        self.mh8 = mh8
        # identity columns as FIXED-WIDTH bytes: numpy S-arrays ship
        # zero-copy like the numeric columns (an object-dtype string
        # array would re-pickle per task — the exact overhead this
        # store exists to avoid).  Lets the gate emit int row ids and
        # the string stage restore (url, slug) after the slim dedupe
        # exchange.
        self.urls_b = urls_b
        self.slugs_b = slugs_b

    def url_strs(self, idx: np.ndarray) -> np.ndarray:
        """Decoded url strings for row indices (vectorized)."""
        return np.char.decode(self.urls_b[idx], "utf-8").astype(object)

    def slug_strs(self, idx: np.ndarray) -> np.ndarray:
        return np.char.decode(self.slugs_b[idx], "utf-8").astype(object)

    @staticmethod
    def build(urls, sh_list, sh2_list, mh8_list) -> "FeatureStore":
        """From per-record feature sequences (any iterables of numpy
        arrays, same order as ``urls``)."""
        if len(urls) == 0:
            return FeatureStore(
                np.empty(0, np.uint64),
                np.zeros(1, np.int64), np.empty(0, np.uint32),
                np.zeros(1, np.int64), np.empty(0, np.uint32),
                np.empty((0, 0), np.uint8),
            )
        kh = hash_str_array(np.asarray(urls, dtype=object))
        order = np.argsort(kh)
        kh = kh[order]
        sh_list = [np.asarray(sh_list[i], np.uint32) for i in order]
        sh2_list = [np.asarray(sh2_list[i], np.uint32) for i in order]
        mh8 = np.stack([np.asarray(mh8_list[i], np.uint8) for i in order])
        sh_off = np.zeros(len(order) + 1, np.int64)
        np.cumsum([len(s) for s in sh_list], out=sh_off[1:])
        sh2_off = np.zeros(len(order) + 1, np.int64)
        np.cumsum([len(s) for s in sh2_list], out=sh2_off[1:])
        sh_val = (
            np.concatenate(sh_list) if sh_off[-1] else np.empty(0, np.uint32)
        )
        sh2_val = (
            np.concatenate(sh2_list) if sh2_off[-1] else np.empty(0, np.uint32)
        )
        return FeatureStore(kh, sh_off, sh_val, sh2_off, sh2_val, mh8)

    @staticmethod
    def from_arrow(batches) -> "FeatureStore":
        """Vectorized build from pyarrow record batches (columns url,
        shingles, shingles2, mh8): list-column VALUES and offsets are
        taken as flat numpy arrays (zero-copy), and the sort-by-hash
        reorder is one vectorized gather — no per-record Python, unlike
        :meth:`build` (measured ~10 s → <1 s at 200k records)."""
        if not batches:
            return FeatureStore.build([], [], [], [])
        url_parts, sh_v, sh_l, sh2_v, sh2_l, mh_parts = [], [], [], [], [], []
        slug_parts = []
        has_slug = "slug" in batches[0].column_names
        for b in batches:
            url_parts.append(b["url"].to_pandas().to_numpy(object))
            if has_slug:
                slug_parts.append(b["slug"].to_pandas().to_numpy(object))
            for col, vs, ls in (("shingles", sh_v, sh_l), ("shingles2", sh2_v, sh2_l)):
                la = b[col].combine_chunks()
                off = np.asarray(la.offsets)
                vs.append(np.asarray(la.values, dtype=np.uint32))
                ls.append(np.diff(off))
            mh = b["mh8"].combine_chunks()
            mlen = np.diff(np.asarray(mh.offsets))
            width = int(mlen[0]) if len(mlen) else 0
            mh_parts.append(
                np.asarray(mh.values, dtype=np.uint8).reshape(-1, width)
            )
        urls = np.concatenate(url_parts)
        kh = hash_str_array(urls)
        order = np.argsort(kh)

        def gather(values_parts, len_parts):
            values = (
                np.concatenate(values_parts)
                if values_parts
                else np.empty(0, np.uint32)
            )
            lens = np.concatenate(len_parts).astype(np.int64)
            starts = np.zeros(len(lens), np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            s_lens = lens[order]
            s_starts = starts[order]
            out_off = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(s_lens, out=out_off[1:])
            total = int(out_off[-1])
            # one gather: for each output slot, its source index
            gidx = (
                np.repeat(s_starts, s_lens)
                + np.arange(total)
                - np.repeat(out_off[:-1], s_lens)
            )
            return out_off, values[gidx]

        sh_off, sh_val = gather(sh_v, sh_l)
        sh2_off, sh2_val = gather(sh2_v, sh2_l)
        mh8 = np.concatenate(mh_parts)[order]
        urls_b = np.char.encode(urls[order].astype("U"), "utf-8")
        slugs_b = None
        if has_slug:
            slugs = np.concatenate(slug_parts)
            slugs_b = np.char.encode(slugs[order].astype("U"), "utf-8")
        return FeatureStore(
            kh[order], sh_off, sh_val, sh2_off, sh2_val, mh8,
            urls_b=urls_b, slugs_b=slugs_b,
        )

    def rows(self, urls: np.ndarray) -> np.ndarray:
        """Row indices for an array of url strings (must be present)."""
        h = hash_str_array(np.asarray(urls, dtype=object))
        pos = np.searchsorted(self.key_hashes, h)
        pos = np.minimum(pos, max(len(self.key_hashes) - 1, 0))
        # presence contract (see IdListStore.rows): a clamped miss
        # silently resolves to a neighbor's features
        if len(h) and (
            len(self.key_hashes) == 0
            or not np.array_equal(self.key_hashes[pos], h)
        ):
            n_miss = int(
                len(h) if len(self.key_hashes) == 0
                else (self.key_hashes[pos] != h).sum()
            )
            raise KeyError(
                f"FeatureStore: {n_miss} url(s) absent from the store"
            )
        return pos

    def shingles(self, i: int) -> np.ndarray:
        return self.sh_val[self.sh_off[i] : self.sh_off[i + 1]]

    def shingles2(self, i: int) -> np.ndarray:
        return self.sh2_val[self.sh2_off[i] : self.sh2_off[i + 1]]


class IdListStore:
    """Broadcast int64-id → ragged-uint64-list table for the slim-shuffle
    near-dup plans (``ops/dedup.minhash_dup_pairs``): sorted flat numpy
    arrays ship out-of-band (zero-copy ``ray.get`` per task), exactly the
    transport rationale of :class:`FeatureStore` but keyed by an integer
    id column instead of a url hash — no collision surface at all."""

    def __init__(self, ids: np.ndarray, off: np.ndarray, val: np.ndarray):
        self.ids = ids    # sorted int64
        self.off = off    # int64, len n+1
        self.val = val    # uint64 flat values

    @staticmethod
    def from_arrow(batches, id_col: str, list_col: str) -> "IdListStore":
        """Vectorized build from pyarrow tables: list VALUES/offsets as
        flat numpy (zero-copy), sort-by-id as one gather."""
        import pyarrow as pa

        ids_parts, val_parts, len_parts = [], [], []
        for b in batches:
            # Ray's block refs surface EMPTY blocks as empty pandas
            # frames even in Arrow pipelines — skip by generic length
            if getattr(b, "num_rows", len(b)) == 0:
                continue
            ids_parts.append(np.asarray(b[id_col].combine_chunks(), np.int64))
            la = b[list_col].combine_chunks()
            offs = np.asarray(la.offsets, np.int64)
            val_parts.append(
                np.asarray(la.values, np.uint64)[offs[0] : offs[-1]]
            )
            len_parts.append(np.diff(offs))
        if not ids_parts:
            return IdListStore(
                np.empty(0, np.int64), np.zeros(1, np.int64),
                np.empty(0, np.uint64),
            )
        ids = np.concatenate(ids_parts)
        order = np.argsort(ids, kind="mergesort")
        lens = np.concatenate(len_parts).astype(np.int64)
        values = (
            np.concatenate(val_parts) if val_parts else np.empty(0, np.uint64)
        )
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        s_lens, s_starts = lens[order], starts[order]
        off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(s_lens, out=off[1:])
        total = int(off[-1])
        gidx = (
            np.repeat(s_starts, s_lens)
            + np.arange(total)
            - np.repeat(off[:-1], s_lens)
        )
        return IdListStore(ids[order], off, values[gidx])

    def rows(self, ids: np.ndarray) -> np.ndarray:
        """Row indices for an int64 id array (ids must be present)."""
        q = np.asarray(ids, np.int64)
        pos = np.minimum(
            np.searchsorted(self.ids, q), max(len(self.ids) - 1, 0)
        )
        # enforce the "ids must be present" contract: a clamped miss
        # would silently resolve to a NEIGHBOR's sketch and yield
        # plausible-but-wrong similarities downstream
        if len(q) and (len(self.ids) == 0 or not np.array_equal(self.ids[pos], q)):
            missing = q[self.ids[pos] != q] if len(self.ids) else q
            raise KeyError(
                f"IdListStore: {len(missing)} id(s) absent from the "
                f"store (first few: {missing[:5].tolist()})"
            )
        return pos

    def get(self, i: int) -> np.ndarray:
        return self.val[self.off[i] : self.off[i + 1]]

    def nbytes(self) -> int:
        return int(self.ids.nbytes + self.off.nbytes + self.val.nbytes)


class IdScalarStore:
    """Broadcast int64-id → uint64-scalar table (SimHash fingerprints)."""

    def __init__(self, ids: np.ndarray, val: np.ndarray):
        self.ids = ids  # sorted int64
        self.val = val  # uint64

    @staticmethod
    def from_arrow(batches, id_col: str, val_col: str) -> "IdScalarStore":
        ids_parts, val_parts = [], []
        for b in batches:
            if getattr(b, "num_rows", len(b)) == 0:
                continue
            ids_parts.append(np.asarray(b[id_col].combine_chunks(), np.int64))
            val_parts.append(np.asarray(b[val_col].combine_chunks(), np.uint64))
        if not ids_parts:
            return IdScalarStore(np.empty(0, np.int64), np.empty(0, np.uint64))
        ids = np.concatenate(ids_parts)
        order = np.argsort(ids, kind="mergesort")
        return IdScalarStore(ids[order], np.concatenate(val_parts)[order])

    def lookup(self, ids: np.ndarray) -> np.ndarray:
        """Values for an int64 id array (ids must be present)."""
        q = np.asarray(ids, np.int64)
        pos = np.minimum(
            np.searchsorted(self.ids, q), max(len(self.ids) - 1, 0)
        )
        # same presence contract as IdListStore.rows: fail loudly
        # instead of returning a neighbor's fingerprint on a miss
        if len(q) and (len(self.ids) == 0 or not np.array_equal(self.ids[pos], q)):
            missing = q[self.ids[pos] != q] if len(self.ids) else q
            raise KeyError(
                f"IdScalarStore: {len(missing)} id(s) absent from the "
                f"store (first few: {missing[:5].tolist()})"
            )
        return self.val[pos]


__all__ = ["FeatureStore", "IdListStore", "IdScalarStore"]
