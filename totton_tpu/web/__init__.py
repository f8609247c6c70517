"""Web control UI/API.

The reference ships a FastAPI + Jinja2 app (web/); this environment has no
FastAPI, so the same HTTP surface is served with aiohttp + Jinja2:
EQ profile management, OPRA browse/apply/sync, daemon control, status,
device listing, and config editing.
"""
