"""Web UI tests: page rendering (both locales), the template->API JS
contract (every URL the pages fetch must be a registered route), and i18n
catalog consistency."""

import re
from pathlib import Path

import pytest

from totton_tpu.web import i18n

pytest_plugins = "aiohttp.pytest_plugin"

WEB_DIR = Path(__file__).parent.parent / "totton_tpu" / "web"
TEMPLATES = sorted((WEB_DIR / "templates").glob("*.html"))
STATIC_JS = sorted((WEB_DIR / "static").glob("*.js"))


# ------------------------------------------------------------- rendering

@pytest.fixture
async def client(tmp_path, monkeypatch, aiohttp_client):
    monkeypatch.setenv("TOTTON_CONFIG_PATH", str(tmp_path / "config.json"))
    monkeypatch.setenv("TOTTON_EQ_DIR", str(tmp_path / "EQ"))
    from totton_tpu.web.app import create_app

    return await aiohttp_client(create_app())


async def test_pages_render_en(client):
    for path, needle in (("/", "System status"),
                         ("/settings", "Upsample ratio"),
                         ("/opra-sync", "OPRA database sync")):
        resp = await client.get(path)
        assert resp.status == 200
        text = await resp.text()
        assert needle in text, f"{path} missing {needle!r}"
        assert "window.I18N" in text


async def test_pages_render_ja_via_query(client):
    resp = await client.get("/?lang=ja")
    assert "システム状態" in await resp.text()


async def test_serving_card_renders_both_locales(client):
    """The serving-plane operator card (active streams, per-stream
    rates/backlog/latency rendered from /api/status.serve) is part of
    the index page in every locale."""
    text_en = await (await client.get("/")).text()
    assert "Serving plane" in text_en
    assert "serve-streams-table" in text_en
    assert "sv-rss" in text_en  # bounded-memory operator signal
    for key in ("serve.none", "serve.col.latency", "serve.col.backlog"):
        assert key in text_en, f"JS catalog missing {key}"
    text_ja = await (await client.get("/?lang=ja")).text()
    assert "サービングプレーン" in text_ja
    assert "serve-streams-table" in text_ja


async def test_locale_negotiation_accept_language(client):
    resp = await client.get("/settings",
                            headers={"Accept-Language": "ja-JP,ja;q=0.9"})
    assert "設定" in await resp.text()
    resp = await client.get("/settings",
                            headers={"Accept-Language": "fr-FR,fr;q=0.9"})
    assert "Settings" in await resp.text()


async def test_static_assets_served(client):
    for path in ("/static/app.css", "/static/app.js"):
        resp = await client.get(path)
        assert resp.status == 200


# ----------------------------------------------------- JS -> API contract

_URL_RE = re.compile(
    r"""['"`](/(?:api|opra)[^'"`\s?]*)"""  # quoted path starting /api|/opra
)


def _registered_patterns():
    from totton_tpu.web.app import create_app

    app = create_app()
    patterns = []
    for resource in app.router.resources():
        canonical = resource.canonical  # e.g. /api/eq/activate/{name}
        regex = re.sub(r"\{[^}]+\}", r"[^/]+", canonical)
        patterns.append(re.compile(f"^{regex}$"))
    return patterns


def _fetched_paths():
    paths = set()
    for f in TEMPLATES + STATIC_JS:
        for m in _URL_RE.finditer(f.read_text()):
            # JS template interpolations (${...}) are dynamic segments.
            path = re.sub(r"\$\{[^}]*\}", "dynamic", m.group(1))
            paths.add((f.name, path))
    return paths


def test_every_fetched_url_is_a_registered_route():
    patterns = _registered_patterns()
    fetched = _fetched_paths()
    assert fetched, "no fetched URLs found — extraction regex broken?"
    unmatched = [
        (fname, path) for fname, path in fetched
        if not any(p.match(path) for p in patterns)
    ]
    assert not unmatched, f"templates call unregistered routes: {unmatched}"


# ------------------------------------------------------------------ i18n

_T_KEY_RE = re.compile(r"""\bt\(\s*['"]([a-z0-9_.]+)['"]\s*\)""")
_TR_KEY_RE = re.compile(r"""\btr\(\s*['"]([a-z0-9_.]+)['"]\s*\)""")


def _keys_used():
    keys = set()
    for f in TEMPLATES:
        keys.update(_T_KEY_RE.findall(f.read_text()))
        keys.update(_TR_KEY_RE.findall(f.read_text()))
    for f in STATIC_JS:
        keys.update(_TR_KEY_RE.findall(f.read_text()))
    return keys


def test_all_template_keys_exist_in_catalog():
    used = _keys_used()
    assert used, "no i18n keys found in templates?"
    en = i18n.TRANSLATIONS["en"]
    missing = sorted(k for k in used if k not in en)
    assert not missing, f"keys used but not in en catalog: {missing}"


def test_locales_have_identical_key_sets():
    en = set(i18n.TRANSLATIONS["en"])
    for locale, table in i18n.TRANSLATIONS.items():
        assert set(table) == en, f"{locale} catalog drifted from en"


def test_js_catalog_keys_exist():
    import json

    catalog = json.loads(i18n.js_catalog("en"))
    for key, value in catalog.items():
        assert value and value != key, f"JS key {key} untranslated"


def test_negotiate_locale_fallbacks():
    class Req:
        def __init__(self, query=None, headers=None):
            self.query = query or {}
            self.headers = headers or {}

    assert i18n.negotiate_locale(None) == "en"
    assert i18n.negotiate_locale(Req({"lang": "ja"})) == "ja"
    assert i18n.negotiate_locale(Req({"lang": "xx"})) == "en"
    assert i18n.negotiate_locale(
        Req(headers={"Accept-Language": "ja;q=0.8, en;q=0.5"})) == "ja"


# ------------------------------------------------------- EQ response curve

VALID_PROFILE = ("Preamp: -6 dB\n"
                 "Filter 1: ON PK Fc 1000 Hz Gain -3 dB Q 1.4\n")


async def test_eq_response_curve(client, tmp_path, monkeypatch):
    eq_dir = tmp_path / "EQ"
    eq_dir.mkdir(exist_ok=True)
    (eq_dir / "demo.txt").write_text(VALID_PROFILE)

    resp = await client.get("/api/eq/response?name=demo&points=64")
    assert resp.status == 200
    body = await resp.json()
    assert body["name"] == "demo"
    assert len(body["frequencies_hz"]) == 64
    assert len(body["magnitude_db"]) == 64
    # Preamp -6 dB at the low end (PK band at 1 kHz barely reaches 10 Hz).
    assert abs(body["magnitude_db"][0] - (-6.0)) < 0.2
    # Dip of about -3 dB relative to preamp near 1 kHz.
    f = body["frequencies_hz"]
    i = min(range(len(f)), key=lambda j: abs(f[j] - 1000.0))
    assert body["magnitude_db"][i] < -7.5

    # Unknown profile -> 404; unsafe name -> 400; bad params -> 400.
    assert (await client.get("/api/eq/response?name=ghost")).status == 404
    assert (await client.get("/api/eq/response?name=../etc")).status == 400
    assert (await client.get(
        "/api/eq/response?name=demo&sample_rate=1")).status == 400


async def test_eq_response_active_fallback(client):
    # No active profile configured -> 404.
    assert (await client.get("/api/eq/response")).status == 404
