"""pulsar_message_filter_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``streamnative/pulsar-message-filter``.

The reference snapshot (/root/reference/README.md:1 — its only line) names a
Pulsar broker-side entry/message filter.  This engine re-expresses that
capability class Spark-first (see SURVEY.md §0.3):

* a JMS/SQL92 **message-selector compiler** (``selector``) that parses the
  selector grammar once and emits an ordinary Catalyst ``Column`` — the
  parse-at-subscribe / evaluate-per-entry contract, vectorized;
* **verdict routing** (ACCEPT / REJECT / RESCHEDULE) and per-subscription
  fan-out over batch DataFrames and Structured Streaming (``filtering``,
  ``streaming``);
* a full **relational core** (joins, aggregates, windows, set ops) and a
  scalar-function library, all built-in Catalyst operators;
* **LLM-data-pipeline operators**: dedup (exact / MinHash-LSH / SimHash),
  similarity search, text analysis, multimodal column plumbing.

Everything here derives from public knowledge only: the Apache Spark 4.x
API, the JMS 2.0 §3.8 selector grammar, and the Pulsar PIP-105 entry-filter
framework, all public documentation.
"""

from pulsar_message_filter_spark.session import configure, get_spark
from pulsar_message_filter_spark.io import TABLES, load, load_all
from pulsar_message_filter_spark.selector import Selector, compile_selector

__all__ = [
    "configure",
    "get_spark",
    "TABLES",
    "load",
    "load_all",
    "Selector",
    "compile_selector",
]

__version__ = "0.1.0"
