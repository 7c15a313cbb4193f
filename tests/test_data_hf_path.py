"""The real-dataset pipeline driven end-to-end against a local HF fixture.

The production path is ``DataManager.load_examples`` →
``datasets.load_dataset("nvidia/OpenMathInstruct-2", split="train_1M")``
(reference ``data.py:48-62``) — unreachable in this air-gapped env. These
tests prove the SAME code path (load → template → tokenize → split →
collate) against a ``datasets.Dataset.from_dict`` fixture standing in for
the hub dataset, asserting the contract the reference establishes:

* template bytes around each (problem, generated_solution) pair
  (``data.py:13-29``, byte-identical constant);
* ``num_of_samples`` cap via ``Dataset.select`` (``data.py:88-90``);
* 90/10 split drawn with seed 42 (``data.py:55``);
* causal-LM collation padded to a multiple of 16 (``data.py:58-62``),
  here to a static bucket.
"""
import numpy as np
import pytest

from llm_fp8_tpu.training.data import CHAT_TEMPLATE, DataConfig, DataManager

datasets = pytest.importorskip("datasets")


class ByteTok:
    """Transparent tokenizer: one token per byte, +3 offset (0=pad)."""

    pad_token_id = 0
    eos_token_id = 1

    def __call__(self, text, truncation=True, max_length=None):
        ids = [b + 3 for b in text.encode("utf-8")]
        if truncation and max_length is not None:
            ids = ids[:max_length]
        return {"input_ids": ids}


def _fixture_rows(n=20):
    return {
        "problem": [f"What is {i} + {i}?" for i in range(n)],
        "generated_solution": [
            f"{i} + {i} = {2 * i}. The answer is \\boxed{{{2 * i}}}."
            for i in range(n)
        ],
        # the hub dataset carries extra columns the loader must ignore
        "expected_answer": [str(2 * i) for i in range(n)],
    }


@pytest.fixture
def hub_stub(monkeypatch):
    """Route datasets.load_dataset to a local Dataset.from_dict fixture,
    recording the (name, split) the pipeline asked for."""
    calls = {}

    def fake_load_dataset(name, split=None):
        calls["name"], calls["split"] = name, split
        return datasets.Dataset.from_dict(_fixture_rows())

    monkeypatch.setattr(datasets, "load_dataset", fake_load_dataset)
    return calls


def _manager(**cfg_kw):
    cfg = DataConfig(max_seq_length=cfg_kw.pop("max_seq_length", 96),
                     **cfg_kw)
    return DataManager(cfg, ByteTok())


def test_load_examples_routes_name_split_and_columns(hub_stub):
    dm = _manager()
    rows = dm.load_examples()
    assert hub_stub["name"] == "nvidia/OpenMathInstruct-2"
    assert hub_stub["split"] == "train_1M"
    assert len(rows) == 20
    # only the two template columns survive, verbatim
    assert set(rows[0]) == {"problem", "generated_solution"}
    assert rows[7]["problem"] == "What is 7 + 7?"
    assert rows[7]["generated_solution"].endswith("\\boxed{14}.")


def test_num_of_samples_cap_uses_select(hub_stub):
    rows = _manager(num_of_samples=5).load_examples()
    assert len(rows) == 5
    assert rows[4]["problem"] == "What is 4 + 4?"
    # cap larger than the dataset must not raise (reference: min(n, len))
    assert len(_manager(num_of_samples=999).load_examples()) == 20


def test_template_bytes_around_each_pair(hub_stub):
    dm = _manager(max_seq_length=4096)
    rows = dm.load_examples()
    ids = dm.encode(rows[3])
    expect = CHAT_TEMPLATE.format(
        problem="What is 3 + 3?",
        solution="3 + 3 = 6. The answer is \\boxed{6}.",
    )
    # the byte tokenizer is invertible: the encoded stream IS the template
    text = bytes(int(t) - 3 for t in ids).decode("utf-8")
    assert text == expect
    assert text.startswith(
        "<|begin_of_text|><|start_header_id|>system<|end_header_id|>"
    )
    assert "\\boxed{}" in text.replace("\\boxed{6}", "\\boxed{}")


def test_truncation_at_max_seq_length(hub_stub):
    dm = _manager(max_seq_length=32)
    rows = dm.load_examples()
    assert len(dm.encode(rows[0])) == 32


def test_split_seed42_90_10(hub_stub):
    dm = _manager(max_seq_length=64)
    train, test = dm.build()
    # 20 rows → 2 held out (10%), drawn with RandomState(42)
    assert len(train) == 18 and len(test) == 2
    held = set(np.random.RandomState(42).permutation(20)[:2].tolist())
    encoded = {i: dm.encode(r) for i, r in enumerate(dm.load_examples())}
    for row, idx in zip(test, sorted(held)):
        np.testing.assert_array_equal(row, encoded[idx])
    # train preserves corpus order minus the holdout
    keep = [i for i in range(20) if i not in held]
    for row, idx in zip(train, keep):
        np.testing.assert_array_equal(row, encoded[idx])


def test_collate_static_bucket_shapes(hub_stub):
    dm = _manager(max_seq_length=90)  # not a multiple of 16 → bucket 96
    train, _ = dm.build()
    batches = list(dm.batches(train, 4, shuffle=False))
    assert len(batches) == len(train) // 4
    for b in batches:
        assert b["input_ids"].shape == (4, 96)
        assert b["attention_mask"].shape == (4, 96)
        assert b["input_ids"].dtype == np.int32
        # mask marks exactly the real tokens; padding is pad_token_id
        lens = b["attention_mask"].sum(1)
        for j in range(4):
            assert (b["input_ids"][j, lens[j]:] == 0).all()
            assert (b["input_ids"][j, :lens[j]] != 0).all()


def test_end_to_end_fixture_through_train_step(hub_stub):
    """The full chain feeds a real train step (shapes + finite loss)."""
    import jax
    import jax.numpy as jnp

    from llm_fp8_tpu.models import get_config, init_params
    from llm_fp8_tpu.training import TrainConfig, Trainer

    dm = _manager(max_seq_length=48, batch_size=4)
    train, _ = dm.build()
    cfg = get_config("debug-tiny")
    trainer = Trainer(cfg, TrainConfig(total_steps=2, warmup_steps=1))
    state = trainer.init_state(
        init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32))
    batch = next(dm.batches(train, 4, shuffle=True, seed=0))
    state, m = trainer.train_step(
        state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(m["loss"]))
