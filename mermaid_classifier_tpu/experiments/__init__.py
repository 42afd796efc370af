"""Measured-but-not-shipped experiments.

Code here is correct and tested, but benchmarking showed it should not be
the production path on current hardware/toolchains. Each module documents
the measurements and the promotion criteria.
"""
