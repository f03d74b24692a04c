"""swmaestro_crawler_spark — a PySpark-native crawl + analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
JihongPark-Moloco/SWMaestro-Crawler (a sequential requests/BeautifulSoup
YouTube crawler orchestrated over RabbitMQ + PostgreSQL) as idiomatic Spark
DataFrame pipelines:

- URL frontier as a DataFrame/table instead of RabbitMQ queues
  (reference: sendToRabbitMQ.py:53-66, supervisor.py:43-196)
- bloom + exact-confirm URL-seen set instead of Python set / per-row
  ``SELECT ... WHERE id=...`` probes (reference: Insert_Nox_Data_to_DB.py:52,
  New_YouTube_Crawler_Comment.py:275-313)
- per-host politeness budget as a window-rank operator instead of
  ``time.sleep`` (reference: New_YouTube_Crawler.py:93,
  New_YouTube_Crawler_Comment.py:443-448)
- batch fetch + span extraction as one fused ``mapInArrow`` pass over
  salted host sub-buckets instead of one process per proxy port
  (reference: supervisor.py:146-160)
- interleaved text+media span documents as
  ``array<struct<kind,text,media_ref,offset>>`` columns instead of
  flattened SQL INSERTs (reference: New_YouTube_Crawler_Comment.py:168-183)

No code is copied from the reference; file:line citations in docstrings
point at the behavior being re-expressed.
"""

__version__ = "0.1.0"
