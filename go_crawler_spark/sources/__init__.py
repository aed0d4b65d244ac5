"""Source-format readers/writers beyond plain parquet: WARC response
records (the Common-Crawl container format) and sitemap XML seed lists."""
