"""OPRA integration tests: database reader, conversion, modern target,
cache lifecycle, downloader with fake fetcher, sync service — strategy
modeled on the reference's test_opra_*.py suites (network-free via the
injectable fetcher and tmp_path caches)."""

import json

import pytest

from totton_tpu.integration.modern_target import MODERN_TARGET_SPEC
from totton_tpu.integration.opra import (
    ApoProfile,
    OpraDatabase,
    apply_modern_target_correction,
    convert_opra_band,
    convert_opra_to_apo,
    slope_to_q,
)
from totton_tpu.integration.opra_cache import (
    OpraCacheManager,
    compute_sha256,
    normalize_commit_sha,
)
from totton_tpu.integration.opra_downloader import (
    OpraNetworkError,
    OpraValidationError,
    download_opra_database,
    resolve_latest_commit_sha,
    validate_database,
)
from totton_tpu.integration.opra_sync import OpraSyncService, SyncInProgressError

SAMPLE_DB = "\n".join([
    json.dumps({"type": "vendor", "id": "v1", "data": {"name": "Sennheiser"}}),
    json.dumps({"type": "vendor", "id": "v2", "data": {"name": "AKG"}}),
    json.dumps({"type": "product", "id": "p1",
                "data": {"name": "HD650", "vendor_id": "v1",
                         "type": "headphone"}}),
    json.dumps({"type": "product", "id": "p2",
                "data": {"name": "K371", "vendor_id": "v2",
                         "type": "headphone"}}),
    json.dumps({"type": "product", "id": "p3",
                "data": {"name": "NoEq", "vendor_id": "v1"}}),
    json.dumps({"type": "eq", "id": "e1",
                "data": {"product_id": "p1", "author": "oratory1990",
                         "name": "HD650 EQ",
                         "parameters": {"gain_db": -6.4, "bands": [
                             {"type": "peak_dip", "frequency": 200,
                              "gain_db": -2.0, "q": 0.6},
                             {"type": "low_shelf", "frequency": 105,
                              "gain_db": 4.0, "q": 0.7},
                             {"type": "high_pass", "frequency": 20,
                              "slope": 12},
                             {"type": "band_stop", "frequency": 9000},
                         ]}}}),
    json.dumps({"type": "eq", "id": "e2",
                "data": {"product_id": "p2", "author": "someone",
                         "parameters": {"gain_db": -2.0, "bands": []}}}),
    "not json at all",
])


@pytest.fixture
def db(tmp_path):
    p = tmp_path / "database_v1.jsonl"
    p.write_text(SAMPLE_DB)
    return OpraDatabase(p)


class TestDatabase:
    def test_counts(self, db):
        assert db.vendor_count == 2
        assert db.product_count == 3
        assert db.eq_profile_count == 2

    def test_vendors_sorted(self, db):
        assert [v["name"] for v in db.get_vendors()] == ["AKG", "Sennheiser"]

    def test_search_requires_eq_profiles(self, db):
        assert db.search("NoEq") == []
        hits = db.search("hd650")
        assert len(hits) == 1 and hits[0]["vendor"]["name"] == "Sennheiser"

    def test_search_by_vendor_name(self, db):
        hits = db.search("akg")
        assert [h["name"] for h in hits] == ["K371"]

    def test_relevance_order(self, db):
        hits = db.search("")  # matches everything with profiles
        assert len(hits) == 2

    def test_get_product_and_eq(self, db):
        p = db.get_product("p1")
        assert p["eq_profiles"][0]["id"] == "e1"
        assert db.get_eq_profile("e1")["author"] == "oratory1990"
        assert db.get_eq_profile("nope") is None

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="OPRA database"):
            OpraDatabase(tmp_path / "none.jsonl").vendor_count


class TestConversion:
    def test_type_mapping_and_slope(self, db):
        apo = convert_opra_to_apo(db.get_eq_profile("e1"))
        types = [b.filter_type for b in apo.bands]
        assert types == ["PK", "LS", "HP"]  # band_stop dropped
        hp = apo.bands[2]
        assert hp.q == pytest.approx(0.707)
        assert hp.gain_db == 0.0
        assert apo.preamp_db == -6.4

    def test_slope_table(self):
        assert slope_to_q(12) == 0.707
        assert slope_to_q(24) == 0.541
        assert slope_to_q(99) == 0.707  # default

    def test_unsupported_band(self):
        assert convert_opra_band({"type": "band_pass"}) is None

    def test_apo_format_round_trips_through_parser(self, db):
        from totton_tpu.eq.apo import parse_eq_string

        apo = convert_opra_to_apo(db.get_eq_profile("e1"))
        text = apo.to_apo_format()
        parsed = parse_eq_string(text)
        assert parsed.preamp_db == pytest.approx(-6.4)
        assert len(parsed.bands) == 3

    def test_modern_target_correction(self):
        profile = ApoProfile(name="x", preamp_db=-5.0)
        corrected = apply_modern_target_correction(profile)
        assert corrected.preamp_db == pytest.approx(-5.0 - 2.8)
        band = corrected.bands[-1]
        assert MODERN_TARGET_SPEC.matches_primary(
            band.frequency, band.gain_db, band.q
        )
        assert "KB5000_7" in corrected.details


class TestCache:
    def test_sha_validation(self):
        assert normalize_commit_sha("ABCDEF1") == "abcdef1"
        with pytest.raises(ValueError):
            normalize_commit_sha("../escape")

    def test_install_activate_current(self, tmp_path):
        mgr = OpraCacheManager(tmp_path)
        mgr.install_version("a" * 40, b'{"type":"vendor","id":"v","data":{}}')
        assert mgr.get_current_commit() is None
        mgr.activate_version("a" * 40)
        assert mgr.get_current_commit() == "a" * 40
        assert (mgr.current_path / "database_v1.jsonl").exists()
        meta = json.loads(
            (mgr.current_path / "metadata.json").read_text()
        )
        assert meta["commit_sha"] == "a" * 40

    def test_rollback(self, tmp_path):
        mgr = OpraCacheManager(tmp_path)
        mgr.install_version("a" * 40, b"one")
        mgr.activate_version("a" * 40)
        mgr.install_version("b" * 40, b"two")
        mgr.activate_version("b" * 40)
        assert mgr.rollback() == "a" * 40
        assert mgr.get_current_commit() == "a" * 40
        assert mgr.load_state().status == "rolled_back"

    def test_rollback_without_previous(self, tmp_path):
        with pytest.raises(RuntimeError, match="no previous"):
            OpraCacheManager(tmp_path).rollback()

    def test_prune_protects_current_and_previous(self, tmp_path):
        import time

        mgr = OpraCacheManager(tmp_path)
        shas = [c * 40 for c in "abcde"]
        for sha in shas:
            mgr.install_version(sha, sha.encode())
            time.sleep(0.01)
        mgr.activate_version(shas[0])
        mgr.activate_version(shas[1])  # previous = a, current = b
        removed = mgr.prune_versions(keep=2)
        left = set(mgr.list_versions())
        assert shas[0] in left and shas[1] in left
        assert len(removed) >= 1

    def test_compute_sha256(self, tmp_path):
        p = tmp_path / "f"
        p.write_bytes(b"hello")
        import hashlib

        assert compute_sha256(p) == hashlib.sha256(b"hello").hexdigest()


class FetchRecorder:
    """Network-free fetcher stub (the reference test pattern)."""

    def __init__(self, responses):
        self.responses = responses
        self.calls = []

    def __call__(self, url, timeout):
        self.calls.append(url)
        for key, value in self.responses.items():
            if key in url:
                if isinstance(value, Exception):
                    raise value
                return value
        raise OpraNetworkError(f"no stub for {url}")


class TestDownloader:
    def test_resolve_latest(self):
        fetcher = FetchRecorder(
            {"api.github.com": json.dumps([{"sha": "c" * 40}]).encode()}
        )
        assert resolve_latest_commit_sha(fetcher) == "c" * 40

    def test_download_pinned(self):
        fetcher = FetchRecorder({"raw.githubusercontent.com": SAMPLE_DB.encode()})
        result = download_opra_database("d" * 40, fetcher)
        assert result.commit_sha == "d" * 40
        assert result.entry_counts["vendor"] == 2
        assert ("d" * 40) in result.source_url

    def test_validation_rejects_garbage(self):
        with pytest.raises(OpraValidationError):
            validate_database(b"not\njson\nlines")
        with pytest.raises(OpraValidationError):
            validate_database(b"   ")

    def test_network_error_propagates(self):
        fetcher = FetchRecorder({"raw": OpraNetworkError("boom")})
        with pytest.raises(OpraNetworkError):
            download_opra_database("e" * 40, fetcher)


class TestSyncService:
    def test_update_and_status(self, tmp_path):
        svc = OpraSyncService(OpraCacheManager(tmp_path))
        fetcher = FetchRecorder({"raw.githubusercontent.com": SAMPLE_DB.encode()})
        status = svc.update("f" * 40, fetcher)
        assert status["status"] == "success"
        assert status["current_commit"] == "f" * 40
        db_path = svc.cache.current_path / "database_v1.jsonl"
        assert OpraDatabase(db_path).product_count == 3

    def test_update_failure_records_error(self, tmp_path):
        svc = OpraSyncService(OpraCacheManager(tmp_path))
        fetcher = FetchRecorder({"raw": OpraNetworkError("down")})
        with pytest.raises(OpraNetworkError):
            svc.update("a" * 40, fetcher)
        assert svc.status()["status"] == "error"

    def test_update_then_rollback(self, tmp_path):
        svc = OpraSyncService(OpraCacheManager(tmp_path))
        fetcher = FetchRecorder({"raw.githubusercontent.com": SAMPLE_DB.encode()})
        svc.update("1" * 40, fetcher)
        svc.update("2" * 40, fetcher)
        status = svc.rollback()
        assert status["current_commit"] == "1" * 40

    def test_concurrent_update_rejected(self, tmp_path):
        svc = OpraSyncService(OpraCacheManager(tmp_path))
        svc._lock.acquire()
        try:
            with pytest.raises(SyncInProgressError):
                svc.update("a" * 40, lambda u, t: b"")
        finally:
            svc._lock.release()
