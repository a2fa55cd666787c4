"""np_data_validation_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-imagining of the capabilities of
``bjhardcastle/np_data_validation`` (file-integrity lifecycle checks,
reference at /root/reference) as a columnar validation service over
Iceberg-style partitioned tables of pre-tokenized training sequences
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Not a port: the reference is a single-threaded Python file walker with
Mongo/shelve/JSON side tables; this engine declares one Catalyst logical
plan per validation pass (scan -> vectorized xxhash64 fingerprint ->
broadcast/salted join vs manifest -> ordered CASE verdict classifier ->
constraint + drift aggregations -> checkpointed per-partition state).
"""

__version__ = "0.1.0"

from np_data_validation_spark.session import get_spark  # noqa: F401
