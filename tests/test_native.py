"""Native host library (C++) vs numpy fallbacks — exact agreement."""

import numpy as np
import pytest

from oneprot_tpu import native
from oneprot_tpu.data.tokenizers import esm2_tokenizer


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no toolchain?)")
    return native.get_lib()


def test_native_tokenize_matches_python(lib):
    tok = esm2_tokenizer()
    seqs = ["MKTAYIAKQR", "", "A" * 50, "MKZ*?X"]
    fast = native.tokenize_batch(seqs, tok._lut, tok.cls_token_id,
                                 tok.eos_token_id, tok.pad_token_id,
                                 max_len=32, pad_to=32)
    slow = np.full((len(seqs), 32), tok.pad_token_id, np.int32)
    for i, s in enumerate(seqs):
        ids = tok.encode_ids(s, 32)
        slow[i, : len(ids)] = ids
    np.testing.assert_array_equal(fast, slow)


def test_native_tokenizer_is_default_path(lib):
    # the tokenizer __call__ fast path produces identical output to encode_ids
    tok = esm2_tokenizer()
    out = tok(["MKTAY", "MK"], padding=16)
    assert out[0, 0] == 0 and out[0, 6] == 2
    assert out.dtype == np.int32 and out.shape == (2, 16)


def test_native_knn_matches_numpy(lib, monkeypatch):
    from oneprot_tpu.data.utils import graphs as G

    rng = np.random.RandomState(0)
    coords = rng.randn(40, 3).astype(np.float32) * 5
    idx_fast, mask_fast = G.knn_neighbors(coords, k=8, cutoff=10.0)
    monkeypatch.setenv("ONEPROT_NATIVE", "0")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    idx_slow, mask_slow = G.knn_neighbors(coords, k=8, cutoff=10.0)
    # same neighbor sets and masks (order ties can differ -> compare sorted)
    np.testing.assert_array_equal(np.sort(idx_fast, 1), np.sort(idx_slow, 1))
    np.testing.assert_array_equal(mask_fast.sum(1), mask_slow.sum(1))


def test_native_greedy_select_matches_numpy(lib, monkeypatch):
    from oneprot_tpu.data.utils import msa_io

    rng = np.random.RandomState(0)
    alphabet = "ACDEFGHIKL"
    msa = [("q", "".join(alphabet[i] for i in rng.randint(0, 10, 30)))
           for _ in range(20)]
    fast = msa_io.greedy_select(msa, 6)
    monkeypatch.setenv("ONEPROT_NATIVE", "0")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    slow = msa_io.greedy_select(msa, 6)
    assert [s for _, s in fast] == [s for _, s in slow]


def test_loader_prefers_repo_then_package_local(lib, tmp_path, monkeypatch):
    """Installed-wheel layout: when the repo-root native/ dir is absent, the
    loader loads the .so dropped next to the package (pyproject ships
    *.cc/*.so via package-data). Depends on the `lib` fixture so the repo
    .so exists (it's gitignored — a fresh checkout without a toolchain
    must skip, not error; advisor r3 finding), and _SRC_CANDIDATES is
    pointed at nonexistent paths so the assertion can only be satisfied by
    the package-local .so — not by a silent rebuild from the repo source."""
    import shutil

    repo_so = native._first_existing(native._SO_CANDIDATES)
    if repo_so is None:
        pytest.skip("no prebuilt liboneprot_host.so to copy")
    pkg_so = tmp_path / "liboneprot_host.so"
    shutil.copy(repo_so, pkg_so)
    monkeypatch.setattr(native, "_SO_CANDIDATES",
                        (str(tmp_path / "missing.so"), str(pkg_so)))
    monkeypatch.setattr(native, "_SRC_CANDIDATES",
                        (str(tmp_path / "missing_a.cc"),
                         str(tmp_path / "missing_b.cc")))
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    try:
        assert native.available()
    finally:
        native._LIB = None
        native._TRIED = False


def test_loader_numpy_fallback_when_nothing_found(monkeypatch):
    monkeypatch.setattr(native, "_SO_CANDIDATES", ("/nonexistent/a.so",))
    monkeypatch.setattr(native, "_SRC_CANDIDATES", ("/nonexistent/a.cc",))
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    try:
        assert native.get_lib() is None
        # the tokenizer's python path still serves the call surface
        tok = esm2_tokenizer()
        ids = tok(["MKTA"], max_length=16, padding="max_length")
        assert ids.shape == (1, 16)
    finally:
        native._LIB = None
        native._TRIED = False
