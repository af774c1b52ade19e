"""Source-format readers beyond the driver's parquet tables.

`warc` — the web-archive interchange format (ISO 28500), the container
every large crawl corpus ships in. The reference crawler persists
captures as loose files (`pdfcapture.go`, `filesave.go`); a Spark
pipeline ingesting crawls at scale reads WARC, so the engine grows a
real reader/writer for it.
"""
