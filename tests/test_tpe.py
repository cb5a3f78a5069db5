"""Round-6 differential gate for the vectorized TPE hot path."""


def test_vectorized_train_encode_matches_scalar_twin():
    """The vectorized train/encode (int64 pair-code path) must reproduce
    the scalar reference loop EXACTLY — merges dict (content AND insertion
    order), trained stream, encoded stream — across randomized sequences
    engineered to exercise ties (small vocabularies) and self-pair runs
    (a a a a), where the greedy non-overlap and first-seen tie-breaks hide
    off-by-ones. decode∘encode stays the identity throughout."""
    import numpy as np

    from timeseriestokenizer_spark.oracle.numpy_oracle import TpeModel

    rng = np.random.RandomState(11)
    cases = []
    for vocab in (2, 3, 8, 50):
        for n in (0, 1, 2, 7, 40, 300):
            cases.append(rng.randint(1, vocab + 1, n).tolist())
    cases.append([5] * 60)                        # pure self-pair runs
    cases.append([1, 1, 1, 2, 1, 1, 1, 1, 2, 2])  # mixed runs
    for toks in cases:
        for target_extra in (0, 3, 30):
            a = TpeModel(50)
            got = a.train(list(toks), 50 + target_extra)

            ref_model = TpeModel(50)
            if toks:  # replicate train's actual_vocab_size auto-bump
                ref_model.actual_vocab_size = max(50, max(toks))
            ref = ref_model._train_scalar([int(t) for t in toks], target_extra)

            assert got == ref, (toks[:10], target_extra)
            assert list(a.merges.items()) == list(ref_model.merges.items())
            enc_v = a.encode(list(toks))
            enc_s = a._encode_scalar([int(t) for t in toks])
            assert enc_v == enc_s
            assert a.decode(enc_v) == [int(t) for t in toks]
