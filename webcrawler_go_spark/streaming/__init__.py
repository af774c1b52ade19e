"""Structured Streaming twins of the batch-iterative constructs
(SURVEY.md §2.10). The north rule names the batch loop as the chosen
design; these exist to prove the operators carry over unchanged."""
