"""Unit tests for the persistent-compile-cache keying (utils/platform).

Round-4 shipped a home-dir cache shared across machine types, which can
deserialize XLA:CPU AOT executables compiled for a different ISA
(SIGILL class).  The cache dir is now keyed by the host CPU's feature
set; these tests lock the key's properties without touching the real
cache.
"""

import os


def test_machine_key_is_stable_and_wellformed():
    from shoulder_tpu.utils.platform import _machine_key

    k1, k2 = _machine_key(), _machine_key()
    assert k1 == k2                      # deterministic on one host
    arch, h = k1.rsplit("-", 1)
    assert arch                          # platform.machine() prefix
    assert len(h) == 12 and all(c in "0123456789abcdef" for c in h)


def test_cache_dir_is_machine_keyed_and_env_gated(tmp_path, monkeypatch):
    import jax

    from shoulder_tpu.utils import platform as plat

    # the suite runs with the disk cache DISABLED (conftest: the cache
    # WRITE path is the root cause of the round-4 suite segfault);
    # restore whatever dir was configured so this test cannot re-enable
    # cache writes for the rest of the suite
    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("SHOULDER_TPU_CACHE", str(tmp_path))
        d = plat.enable_compilation_cache()
        assert d is not None
        assert d.startswith(str(tmp_path))
        assert d.endswith(plat._machine_key())
        assert os.path.isdir(d)

        monkeypatch.setenv("SHOULDER_TPU_CACHE", "off")
        assert plat.enable_compilation_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
