"""Experimental, non-shipping code paths.

Nothing in this package is on the production dispatch path. Modules here
are kept for their documented measurement history (see PERF.md) and as
starting points if the platform envelope changes.
"""
