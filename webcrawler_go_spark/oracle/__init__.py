"""Sequential (non-Spark) reference oracles for crawl parity testing."""
