"""tantivy_ray — a Ray-Data-native full-text index build + BM25 search engine.

A from-scratch re-expression of the capabilities of quickwit-oss/tantivy
(reference at /root/reference, cited by file:line in docstrings) on top of
``ray.data.Dataset`` pipelines:

- ``analyzer``  : tokenizer + token-filter chains (tantivy ``src/tokenizer/``),
                  with an exact per-string reference path and a vectorized
                  Arrow path used inside ``map_batches``.
- ``index``     : per-partition segment build (postings, term dict, fieldnorms,
                  doc store), bitpacked posting blocks with skip info, global
                  stats, manifest with per-partition lineage, resumable.
- ``search``    : BM25 (k1=1.2, b=0.75) scoring, exhaustive vectorized scorer
                  and block-max WAND, top-k collection with tantivy's tie rules,
                  searcher actor pools for query batches.
- ``functions`` : text-analysis batch functions (lang-id, quality, token
                  counts, fingerprints).
- ``dedup``     : exact / minhash-LSH / simhash / ngram-jaccard / embedding
                  near-dup pipelines.
- ``ann``       : brute-force + LSH-bucketed cosine top-k over embeddings.
- ``pipelines`` : end-to-end index build / query pipelines and the synthetic
                  ``pages`` table generator (BASELINE.json input_hint shape).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75

# Ray worker processes resolve this package by module path, not by the
# driver's sys.path mutations. Exporting PYTHONPATH at import time (before
# any ray.init in our own entry points) makes workers able to unpickle our
# task classes regardless of the driver's cwd; when a foreign driver inits
# Ray before importing us, stages fall back to an explicit runtime_env
# (see utils.remote_args — probed once per session, because an env_vars
# runtime_env forfeits the warm default worker pool).
import os as _os

_PKG_PARENT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _PKG_PARENT not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _PKG_PARENT + _os.pathsep + _os.environ.get("PYTHONPATH", "")
    ).rstrip(_os.pathsep)
