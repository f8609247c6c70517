"""Web UI/API server CLI.

  totton-web [--host 0.0.0.0] [--port 8080]

Serves the control surface (EQ management, OPRA browse/apply/sync, daemon
control, status, config) — the reference's uvicorn+FastAPI entrypoint,
on aiohttp.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    from aiohttp import web

    from totton_tpu.web.app import create_app

    p = argparse.ArgumentParser(prog="totton-web", description=__doc__)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args(argv)

    web.run_app(create_app(), host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
