"""AOT program cache (`utils/cache.exported_call`).

Tracing+lowering the MSM pipeline costs ~73 s per fresh process at the
production shape; exported_call serializes the traced program to disk so
warm processes skip Python tracing (DESIGN.md "Compile-time budget")."""
import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_msm_tpu.utils import cache


@pytest.fixture()
def export_dir(tmp_path, monkeypatch):
    # MSM_EXPORT_DIR takes precedence over the module default (and over any
    # outer redirect the test runner itself was launched with)
    monkeypatch.setenv("MSM_EXPORT_DIR", str(tmp_path))
    monkeypatch.setattr(cache, "_EXPORTED", {})
    monkeypatch.delenv("MSM_NO_EXPORT_CACHE", raising=False)
    return tmp_path


def test_exported_call_roundtrip_and_disk_reuse(export_dir):
    calls = []

    def fn(x, y):
        calls.append(1)
        return x * jnp.uint32(3) + y

    x = jnp.arange(8, dtype=jnp.uint32)
    y = jnp.ones(8, dtype=jnp.uint32)
    out1 = np.asarray(cache.exported_call("t", fn, x, y))
    assert np.array_equal(out1, np.arange(8) * 3 + 1)
    assert len(calls) == 1
    files = list(export_dir.glob("t-*.stablehlo"))
    assert len(files) == 1

    # memoized: no retrace
    np.asarray(cache.exported_call("t", fn, x, y))
    assert len(calls) == 1

    # fresh process simulation: clear the in-memory memo; the disk artifact
    # must be used WITHOUT calling fn again
    cache._EXPORTED.clear()
    out2 = np.asarray(cache.exported_call("t", fn, x, y))
    assert np.array_equal(out2, out1)
    assert len(calls) == 1


def test_exported_call_key_includes_shape_and_source(export_dir, monkeypatch):
    def fn(x):
        return x + jnp.uint32(1)

    a = cache.exported_call("k", fn, jnp.zeros(4, jnp.uint32))
    assert len(list(export_dir.glob("k-*.stablehlo"))) == 1
    # different shape -> different artifact
    cache.exported_call("k", fn, jnp.zeros(8, jnp.uint32))
    assert len(list(export_dir.glob("k-*.stablehlo"))) == 2
    # source-tree change -> different artifact (stale programs can't load)
    monkeypatch.setattr(cache, "_SOURCE_HASH", "deadbeef00000000")
    cache.exported_call("k", fn, jnp.zeros(4, jnp.uint32))
    assert len(list(export_dir.glob("k-*.stablehlo"))) == 3
    assert np.asarray(a)[0] == 1


def test_exported_call_bypass_env(export_dir, monkeypatch):
    monkeypatch.setenv("MSM_NO_EXPORT_CACHE", "1")

    def fn(x):
        return x + jnp.uint32(2)

    out = cache.exported_call("b", fn, jnp.zeros(4, jnp.uint32))
    assert int(np.asarray(out)[0]) == 2
    assert list(export_dir.glob("b-*.stablehlo")) == []


@pytest.mark.cold
def test_committed_aot_seed_matches_source_tree():
    """The committed aot/ seed must be packed from THIS source tree.

    Export keys embed the source hash, so a seed packed before a code change
    is unreachable dead weight and the driver's cold start silently loses the
    compile_s win (round-4 advice: staleness detection). pack_aot.py records
    the hash it packed under; re-run `python scripts/pack_aot.py` (after
    warming .cache via bench.py) whenever this fails.
    """
    from pathlib import Path

    aot = Path(cache.__file__).resolve().parents[2] / "aot"
    marker = aot / "SOURCE_HASH"
    if not aot.is_dir():
        pytest.skip("no committed aot/ seed")
    assert marker.exists(), "aot/ lacks SOURCE_HASH; re-run scripts/pack_aot.py"
    assert marker.read_text().strip() == cache._source_hash(), (
        "committed aot/ seed was packed from a different source tree; "
        "re-run the production paths (python bench.py) then scripts/pack_aot.py"
    )


def test_exported_call_corrupt_seed_falls_back(export_dir):
    """A corrupt/incompatible disk artifact must degrade to a fresh trace
    (the committed aot/ seed is a cache, not a dependency)."""
    calls = []

    def fn(x):
        calls.append(1)
        return x + jnp.uint32(7)

    x = jnp.zeros(4, jnp.uint32)
    key = cache.export_cache_key("c", x)
    (export_dir / f"c-{key}.stablehlo").write_bytes(b"not a stablehlo module")
    with pytest.warns(UserWarning, match="re-tracing"):
        out = np.asarray(cache.exported_call("c", fn, x))
    assert out[0] == 7 and len(calls) == 1
    # the re-traced artifact replaced the corrupt one and reloads cleanly
    cache._EXPORTED.clear()
    assert np.asarray(cache.exported_call("c", fn, x))[0] == 7
    assert len(calls) == 1
