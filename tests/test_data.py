"""Data pipeline tests: proto stream, brace expansion, packing, collation."""

import numpy as np

from fish_speech_tpu.data import (
    InterleaveDataset,
    SemanticIterableDataset,
    TextDataCollator,
    braceexpand,
    data_loader,
    read_pb_stream,
    write_pb_stream,
)
from fish_speech_tpu.data.protos import Semantics, Sentence, TextData
from fish_speech_tpu.text import ByteTokenizer


def _write_corpus(path, n_groups=3, n_sentences=5, n_codebooks=4, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        for g in range(n_groups):
            td = TextData(source="test", name=f"spk{g}")
            for s in range(n_sentences):
                sent = Sentence()
                sent.texts.append(f"sentence {g} {s}")
                t = int(rng.integers(3, 9))
                for _ in range(n_codebooks):
                    sem = sent.semantics.add()
                    sem.values.extend(rng.integers(0, 64, t).tolist())
                td.sentences.append(sent)
            write_pb_stream(f, td)
    return path


def test_pb_stream_roundtrip(tmp_path):
    p = _write_corpus(tmp_path / "corpus.protos")
    with open(p, "rb") as f:
        groups = list(read_pb_stream(f))
    assert len(groups) == 3
    assert groups[0].name == "spk0"
    assert len(groups[0].sentences) == 5


def test_braceexpand():
    assert list(braceexpand("a{b,c}d")) == ["abd", "acd"]
    assert list(braceexpand("x{0..3}")) == ["x0", "x1", "x2", "x3"]
    assert list(braceexpand("s{01..03}.proto")) == [
        "s01.proto", "s02.proto", "s03.proto"]
    assert list(braceexpand("plain")) == ["plain"]
    assert list(braceexpand("a{b,{c,d}}e")) == ["abe", "ace", "ade"]


def test_dataset_packing_and_collation(tmp_path):
    p = _write_corpus(tmp_path / "corpus.protos")
    tok = ByteTokenizer(n_semantic=64)
    ds = SemanticIterableDataset([str(p)], tok, seed=0, max_length=256,
                                 num_codebooks=4)
    it = iter(ds)
    item = next(it)
    tokens, labels = item["tokens"], item["labels"]
    assert tokens.shape[0] == 5  # K+1
    assert tokens.shape == labels.shape

    # semantic rows: where row-0 token is semantic, codes are present
    sem_mask = (tokens[0] >= tok.semantic_begin_id) & (tokens[0] <= tok.semantic_end_id)
    assert sem_mask.any()
    # non-semantic positions are codebook-padded
    assert (tokens[1:, ~sem_mask] == 0).all()

    collator = TextDataCollator(tok, max_length=128)
    loader = data_loader(ds, collator, batch_size=2)
    batch = next(loader)
    assert batch["inputs"].shape[0] == 2
    assert batch["inputs"].shape[1] == 5
    assert batch["inputs"].shape == batch["labels"].shape
    assert batch["attention_masks"].shape == (2, batch["inputs"].shape[2])


def test_interleave(tmp_path):
    p = _write_corpus(tmp_path / "corpus.protos")
    tok = ByteTokenizer(n_semantic=64)
    d1 = SemanticIterableDataset([str(p)], tok, seed=0, num_codebooks=4)
    d2 = SemanticIterableDataset([str(p)], tok, seed=1, num_codebooks=4)
    mix = InterleaveDataset([d1, d2], [0.5, 0.5], seed=0)
    items = [next(iter(mix)) for _ in range(3)]
    assert all(i["tokens"].shape[0] == 5 for i in items)


def test_train_on_packed_data(tmp_path):
    """Loss runs end-to-end on real packed data."""
    import jax
    import jax.numpy as jnp

    from fish_speech_tpu.models.config import DualARConfig
    from fish_speech_tpu.models.init import init_dual_ar_params
    from fish_speech_tpu.train import TrainBatch, dual_ar_loss

    p = _write_corpus(tmp_path / "corpus.protos")
    tok = ByteTokenizer(n_semantic=64)
    cfg = DualARConfig(
        vocab_size=tok.vocab_size, n_layer=1, n_head=2, n_local_heads=2,
        dim=32, head_dim=16, intermediate_size=64, max_seq_len=512,
        codebook_size=64, num_codebooks=4,
        semantic_begin_id=tok.semantic_begin_id,
        semantic_end_id=tok.semantic_end_id,
        n_fast_layer=1, fast_dim=32, fast_n_head=2, fast_n_local_heads=2,
        fast_head_dim=16, fast_intermediate_size=64)
    params = init_dual_ar_params(jax.random.key(0), cfg)

    ds = SemanticIterableDataset([str(p)], tok, seed=0, max_length=128,
                                 num_codebooks=4)
    batch_dict = next(data_loader(ds, TextDataCollator(tok, 128), 2))
    batch = TrainBatch(inputs=jnp.asarray(batch_dict["inputs"]),
                       labels=jnp.asarray(batch_dict["labels"]),
                       attention_masks=jnp.asarray(batch_dict["attention_masks"]))
    loss, metrics = dual_ar_loss(params, cfg, batch, remat=False)
    assert np.isfinite(float(loss))
    assert float(metrics["semantic_loss"]) > 0
