"""Sources: synthetic Common-Crawl-style pages + parquet test-table catalog."""
