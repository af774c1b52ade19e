"""Driver-side plans: the batch-iterative frontier loop, sitemap and feed
modes (SURVEY.md §3)."""
