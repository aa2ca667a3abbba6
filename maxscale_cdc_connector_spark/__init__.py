"""PySpark-native CDC analytics engine.

A from-scratch rebuild of the *capabilities* of the MariaDB MaxScale CDC
connector (reference: /root/reference, a single-file C++ client library —
``cdc_connector.cpp``/``cdc_connector.h``) as an idiomatic PySpark engine:

* a Structured Streaming source speaking the MaxScale CDC wire protocol
  (auth → register → request-data → newline-JSON events; see
  ``sources/cdc_datasource.py``),
* batch + streaming CDC-semantic operators (decode, GTID, latest-snapshot,
  resume-offset, update-pairs; see ``operators/cdc.py``),
* a full relational query layer on Catalyst built-ins (``queries/``),
* LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/Jaccard),
  similarity search, text analysis, multimodal column plumbing
  (``operators/{dedup,simsearch,text,multimodal}.py``).

Everything is DataFrame/SQL-first so Catalyst + Tungsten pick the physical
strategy; Python UDFs appear only where built-ins cannot express the
semantics, and then only as Arrow-batched pandas UDFs.
"""

from maxscale_cdc_connector_spark.session import get_session, load_table, load_tables

__version__ = "0.1.0"

__all__ = ["get_session", "load_table", "load_tables", "__version__"]
