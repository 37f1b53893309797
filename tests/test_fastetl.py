"""Native ETL library: build, parity with the Python tokenizer/parsers,
and a small speed sanity check."""

import time

import numpy as np
import pytest

from newsreclib_tpu.data import fastetl
from newsreclib_tpu.data.tokenize import word_tokenize


@pytest.fixture(scope="module")
def lib():
    lib = fastetl.get_lib()
    if lib is None:
        pytest.skip("native build unavailable")
    return lib


def test_native_builds(lib):
    m = fastetl.StrMap({"hello": 1, "world": 2})
    assert m.native
    assert lib.fe_strmap_size(m._handle) == 2


def test_tokenize_parity_ascii(lib):
    vocab_words = ["the", "cat", "sat", "on", "mat", ".", ",", "!", "42", "a_b"]
    vocab = {w: i + 1 for i, w in enumerate(vocab_words)}
    texts = [
        "the cat sat on the mat.",
        "unknown words here, the cat!",
        "",
        "42 a_b the...cat",
        "  spaces   everywhere  . ",
    ]
    m = fastetl.StrMap(vocab)
    got_ids, got_lens = fastetl.tokenize_ids(texts, m, cap=16)
    for i, t in enumerate(texts):
        want = [vocab.get(tok, 0) for tok in word_tokenize(t)][:16]
        assert got_ids[i, : len(want)].tolist() == want, t
        assert got_lens[i] == len(want)


def test_tokenize_unicode_words(lib):
    # Norwegian words (pre-lowercased, per the contract)
    vocab = {"fotball": 1, "nyheter": 2, "blåbær": 3}
    m = fastetl.StrMap(vocab)
    ids, lens = fastetl.tokenize_ids(["blåbær og fotball nyheter"], m, cap=8)
    want = [vocab.get(t, 0) for t in word_tokenize("blåbær og fotball nyheter")]
    assert ids[0, : len(want)].tolist() == want


def test_parse_impressions_parity(lib):
    nidmap = fastetl.StrMap({f"N{i}": i for i in range(1, 50)})
    lines = ["N1-0 N2-1 N3-0", "N7-1", "", "N99-0 N4-1", "Nbogus N5-0"]
    rows, labels, lens = fastetl.parse_impressions(lines, nidmap, cap=8)
    assert rows[0, :3].tolist() == [1, 2, 3]
    assert labels[0, :3].tolist() == [0, 1, 0]
    assert lens.tolist() == [3, 1, 0, 2, 1]
    assert rows[3, 0] == 0  # unknown N99 maps to 0
    assert labels[3, 1] == 1


def test_parse_id_lists_parity(lib):
    nidmap = fastetl.StrMap({f"N{i}": i for i in range(1, 50)})
    rows, lens = fastetl.parse_id_lists(["N1 N2 N3", "", "N9"], nidmap, cap=4)
    assert rows[0, :3].tolist() == [1, 2, 3]
    assert lens.tolist() == [3, 0, 1]


def test_native_is_faster_than_python(lib):
    rng = np.random.default_rng(0)
    words = [f"word{i}" for i in range(5000)]
    vocab = {w: i + 1 for i, w in enumerate(words)}
    texts = [" ".join(rng.choice(words, size=30)) for _ in range(3000)]
    m = fastetl.StrMap(vocab)

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    native_t = best_of(lambda: fastetl.tokenize_ids(texts, m, cap=30))
    python_t = best_of(
        lambda: [[vocab.get(tok, 0) for tok in word_tokenize(t)] for t in texts]
    )
    assert native_t < python_t, (native_t, python_t)
