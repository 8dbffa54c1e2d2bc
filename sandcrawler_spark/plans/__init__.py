"""Frontier plans: schemas, synthetic data generation, the per-round
scheduling job, fetch simulation, state/resume, and the single-threaded
oracle used to verify byte-identical crawl ordering."""
