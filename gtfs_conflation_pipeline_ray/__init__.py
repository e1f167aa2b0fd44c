"""gtfs_conflation_pipeline_ray — a from-scratch Ray-Data-native spatial-join +
tiling engine with the query/data-processing capabilities of
``availabs/gtfs-conflation-pipeline`` (reference, read-only at /root/reference).

NOT a port: the reference is a single-threaded Node.js + SQLite pipeline; this
engine expresses every stage as ``ray.data.Dataset`` transforms (``map_batches``
over zero-copy Arrow batches, actor pools for stateful spatial indexes,
``groupby``/``aggregate``/``sort`` for the wide steps) designed for a fixed-size
multi-node cluster streaming ~100 TB through the object store.

Layout
------
- ``functions/`` — pure vectorized kernels (cells, geometry, hashing, text,
  image codecs). No Ray imports; unit-testable against pure-Python oracles.
- ``state/``     — stateful components held by actors (grid spatial index,
  checkpoint manifests).
- ``sources/``   — readers + deterministic fixture/testdata derivations.
- ``stages/``    — ``Dataset -> Dataset`` stage functions (the operator
  inventory of SURVEY.md §2).
- ``pipelines/`` — stage compositions (flagship conflation pipeline, image
  pipeline), checkpoint/resume drivers.

None of this package calls ``ray.init``/``ray.shutdown`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
