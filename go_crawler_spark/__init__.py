"""go_crawler_spark — a from-scratch PySpark-native frontier + fetch scheduler.

A brand-new analytics/crawl engine with the capabilities of the reference
crawler (gallyamow/go-crawler, studied at /root/reference), re-expressed
Spark-first: the frontier is a DataFrame, the fetch is a lookup equi-join
against a Common-Crawl-style pages table, link extraction is a vectorized
Arrow UDF, dedup is an anti-join against a partitioned seen table fronted by
a bloom filter, and the crawl loop is iterative batch with per-round
checkpoints.

Nothing here is a port of the reference's goroutine/channel architecture;
citations of the form ``ref: internal/queue.go:88-96`` mark which reference
*semantics* a given function reproduces.
"""

__version__ = "0.1.0"

from go_crawler_spark.config import CrawlConfig, RetryConfig

__all__ = ["CrawlConfig", "RetryConfig"]
