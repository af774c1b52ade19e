"""Result sinks (SURVEY.md §2.1 S7-S9): CSV result files, XML sitemap,
idempotent file artifacts."""
