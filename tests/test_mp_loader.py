"""mp_map (ordered multi-process map) and its pipeline integration."""

import numpy as np
import pytest

from mm_interleaved_tpu.data.mp_loader import mp_map


def _sq(x):
    return x * x


def test_mp_map_inline_equals_builtin_map():
    assert list(mp_map(_sq, range(10), num_workers=0)) == [
        x * x for x in range(10)
    ]


def test_mp_map_order_preserved_with_workers():
    out = list(mp_map(_sq, range(57), num_workers=3))
    assert out == [x * x for x in range(57)]


def test_mp_map_numpy_payloads():
    arrs = [np.full((4, 4), i, np.float32) for i in range(9)]
    out = list(mp_map(lambda a: a.sum(), iter(arrs), num_workers=2))
    assert out == [a.sum() for a in arrs]


def _boom(x):
    if x == 5:
        raise ValueError("bad item")
    return x


def test_mp_map_propagates_worker_exception():
    with pytest.raises(RuntimeError, match="bad item"):
        list(mp_map(_boom, range(8), num_workers=2))


def test_pipeline_stream_identical_across_worker_counts():
    """The per-doc seeding makes num_workers invisible to the stream."""
    from mm_interleaved_tpu.configs import tiny_config
    from mm_interleaved_tpu.data.pipeline import build_interleaved_source
    from mm_interleaved_tpu.data.tokenizer import load_tokenizer

    cfg = tiny_config()
    tok = load_tokenizer(None, vocab_size=cfg.llm.vocab_size)

    def rows(workers):
        src = build_interleaved_source(
            {"name": "synthetic", "num_samples": 12,
             "num_workers": workers},
            cfg, tok,
        )
        return list(src(0))

    serial, parallel = rows(0), rows(2)
    assert len(serial) == len(parallel) > 0
    for a, b in zip(serial, parallel):
        assert a.keys() == b.keys()
        for k in a:
            if a[k] is None:
                assert b[k] is None
            else:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
