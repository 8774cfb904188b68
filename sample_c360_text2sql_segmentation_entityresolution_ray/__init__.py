"""Ray-Data-native Customer-360 / entity-resolution engine.

A from-scratch re-implementation of the data-processing capabilities of
``aws-samples/sample-c360-text2sql-segmentation-entityresolution`` (the
reference delegates heavy compute to AWS Entity Resolution / Athena /
Personalize; see SURVEY.md).  Here every operator is expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines, ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, explicit
shuffle/skew handling for the wide steps.

Import alias convention::

    import sample_c360_text2sql_segmentation_entityresolution_ray as c360ray

Layout
------
- ``functions/`` — deterministic vectorized kernels (hashing, minhash,
  simhash, string metrics, html extraction).
- ``sources/``   — readers and deterministic fixture synthesis (pages /
  customer-360 tables).
- ``stages/``    — the ER pipeline stages (normalize, blocking, pair
  scoring actor pool, clustering).
- ``ops/``       — the general operator library (relational, dedup,
  ANN, text analysis, multimodal stubs).
- ``pipelines/`` — end-to-end assemblies (entity resolution flagship,
  interactions/segments).
- ``state/``     — checkpoint manifests, job-status registry, retention.

None of this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
