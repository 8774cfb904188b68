"""Text2SQL agent loop: generate → execute → error feedback → retry
(`lambda/webbackend/agent_processor.py:135-171` tool semantics)."""

from __future__ import annotations

import pytest

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
    SchemaRegistry,
    annotate_table,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.sql import (
    Catalog,
    RuleBasedSqlGenerator,
    Text2SqlAgent,
    Text2SqlError,
)

TABLES = ["customer", "orders"]


@pytest.fixture(scope="module")
def catalog(sf_dir):
    cat = Catalog()
    for t in TABLES:
        cat.register_parquet(t, f"{sf_dir}/{t}.parquet")
    return cat


def test_rule_based_demo_questions(catalog, duck):
    agent = Text2SqlAgent(catalog, RuleBasedSqlGenerator())
    res = agent.run("who are our repeat buyers?")
    assert res.turns[-1].ok and res.preview["row_count_probe"] > 0
    # the produced SQL is a real query: DuckDB agrees on the result shape
    exp = duck.sql(res.sql).df()
    got = res.dataset.to_pandas()
    assert len(got) == len(exp) and sorted(got.columns) == sorted(exp.columns)

    res = agent.run("top 5 spenders")
    assert len(res.dataset.to_pandas()) == 5

    res = agent.run("how many orders do we have?")
    assert res.preview["row_count_probe"] == 1


def test_error_feedback_retry(catalog):
    # scripted generator: bad SQL first (unsupported fn), then valid —
    # the loop must surface the error to the generator and succeed on
    # attempt 2, recording both turns
    attempts = []

    def gen(question, schema_prompt, failures):
        attempts.append(list(failures))
        if not failures:
            return "SELECT median(o_totalprice) AS m FROM orders"
        assert "median" in failures[-1][1] or "SqlUnsupported" in failures[-1][1]
        return "SELECT count(*) AS n FROM orders"

    agent = Text2SqlAgent(catalog, gen, max_attempts=3)
    res = agent.run("anything")
    assert [t.ok for t in res.turns] == [False, True]
    assert attempts[0] == [] and len(attempts[1]) == 1


def test_attempt_cap(catalog):
    agent = Text2SqlAgent(
        catalog, lambda q, s, f: "SELECT median(x) FROM nope", max_attempts=2
    )
    with pytest.raises(Text2SqlError) as ei:
        agent.run("q")
    assert len(ei.value.turns) == 2


def test_schema_prompt_reaches_generator(catalog, sf_dir):
    import ray.data

    reg = SchemaRegistry()
    annotate_table(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet"), "orders", reg
    )
    block = reg.prompt_block()
    seen = {}

    def gen(question, schema_prompt, failures):
        seen["prompt"] = schema_prompt
        return "SELECT count(*) AS n FROM orders"

    Text2SqlAgent(catalog, gen, schema_prompt=block).run("q")
    assert "orders" in seen["prompt"] and "o_totalprice" in seen["prompt"]
