"""The per-row invariant (BASELINE.json input_hint): the engine's
extracted text must be byte-identical, per url, to the golden ``text``
column of the pages table."""

from __future__ import annotations

from sample_c360_text2sql_segmentation_entityresolution_ray.functions.extract import (
    extract_text,
    extract_title,
    render_html,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
    pages_dataset,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.stages.normalize import (
    extract_stage,
)


def test_render_extract_roundtrip_unit():
    for text in [
        "hello world",
        "multi\nparagraph\ntext",
        "entities & <tags> > here",
        "",
        "unicode: 中文テキスト éàü",
    ]:
        assert extract_text(render_html(text, "t")) == text


def test_extract_title():
    assert extract_title(render_html("body", "my <title> & x")) == "my <title> & x"


def test_extraction_byte_identical_per_url(sf_dir):
    extracted = extract_stage(pages_dataset(sf_dir), keep_golden_text=True)
    bad = 0
    total = 0
    for batch in extracted.select_columns(["text", "golden_text"]).iter_batches(
        batch_format="pandas", batch_size=4096
    ):
        total += len(batch)
        bad += int((batch["text"] != batch["golden_text"]).sum())
    assert total > 0
    assert bad == 0, f"{bad}/{total} rows differ from golden text"


def test_docs_replication_generator_semantics(ray_session, sf_dir):
    """Corpus replication (r5: grouped generator explode, NOT an R-way
    union — Ray chains union branches into an O(R)-deep plan/stats
    tree that RecursionErrors at R=240): R disjoint doc_id-shifted
    copies, replica 0 bit-equal to the base, every replica's payload
    identical to the base's."""
    import pandas as pd

    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        REPLICA_STRIDE,
        _docs_dataset,
    )

    base = (
        _docs_dataset(sf_dir, 1).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    R = 12
    rep = _docs_dataset(sf_dir, R).to_pandas()
    assert len(rep) == R * len(base)
    assert rep["doc_id"].is_unique
    for r in range(R):
        lo, hi = r * REPLICA_STRIDE, (r + 1) * REPLICA_STRIDE
        part = (
            rep[(rep.doc_id >= lo) & (rep.doc_id < hi)]
            .sort_values("doc_id").reset_index(drop=True)
        )
        part["doc_id"] -= lo
        pd.testing.assert_frame_equal(part, base)
