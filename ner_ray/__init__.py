"""ner_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch engine with the query/data-processing capabilities of
synalp/NER (Wapiti-style CRF sequence tagging: feature templates +
Viterbi decode over token windows, gazetteer features), generalized to a
full KG build over interleaved text+media documents:

    read docs -> flatten text spans -> tokenize/normalize -> gazetteer
    -> CRF tag (actor pool) -> BIO decode -> candidates (broadcast join)
    -> disambiguate -> triples -> exact dedup -> canonicalize (iterated
    groupby-min union-find) -> resolve -> adjacency -> partitioned sink.

The reference checkout at /root/reference is EMPTY in this sandbox
(SURVEY.md section 0); the frozen semantics live in
``ner_ray.oracle.reference_oracle`` — a deliberately simple
single-process implementation that stands in for the reference and
generates golden outputs. The distributed pipeline must match it with
P = R = 1.0 (the spec requires >= 0.95, BASELINE.json:2).

No module in this package calls ``ray.init()`` / ``ray.shutdown()``:
the driver, ``bench.py`` and the pytest session fixture own the Ray
session (see ``__ray_entry__.py`` docstring).
"""

__version__ = "0.1.0"
