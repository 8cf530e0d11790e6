"""Inverted-list index: CSR bucket table build + batched query."""

from nlsh_tpu.index.bucket_table import BucketTable, build_bucket_table  # noqa: F401
from nlsh_tpu.index.query import query_bucket_table  # noqa: F401
from nlsh_tpu.index.indexer import Indexer  # noqa: F401
