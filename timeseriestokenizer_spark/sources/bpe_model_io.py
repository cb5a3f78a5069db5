""""minbpe v1" model text format — parity with the reference's
Tokenizer.save/load (/root/reference/utils/base.py:99-172):

    line 1: ``minbpe v1``
    line 2: pattern (empty for these models)
    line 3: number of special tokens, then one ``<name> <id>`` line each
    then:   one ``<id1> <id2>`` line per merge; the merged id is IMPLICIT
            from line order, starting at ``actual_vocab_size + 1``

The engine's canonical store is the `bpe_models` table (ordered merge
structs, operators/tpe.py); this codec round-trips models with the reference.
"""

from __future__ import annotations

from ..oracle.numpy_oracle import TpeModel


def save_model(
    model: TpeModel, path: str, special_tokens: dict[str, int] | None = None
) -> None:
    with open(path, "w") as f:
        f.write("minbpe v1\n")
        f.write("\n")  # pattern (unused for token models)
        st = special_tokens or {}
        f.write(f"{len(st)}\n")
        for name, idx in st.items():
            f.write(f"{name} {idx}\n")
        for (a, b), _idx in model.merges.items():  # ids implicit by order
            f.write(f"{a} {b}\n")


def load_model(path: str, actual_vocab_size: int) -> tuple[TpeModel, dict[str, int]]:
    merges: dict[tuple[int, int], int] = {}
    special: dict[str, int] = {}
    idx = actual_vocab_size + 1
    with open(path) as f:
        version = f.readline().strip()
        assert version == "minbpe v1", f"bad model header: {version!r}"
        _pattern = f.readline().strip()
        num_special = int(f.readline().strip())
        for _ in range(num_special):
            name, sid = f.readline().strip().split()
            special[name] = int(sid)
        for line in f:
            a, b = map(int, line.split())
            merges[(a, b)] = idx
            idx += 1
    return TpeModel(actual_vocab_size, merges), special


def train_or_load(path: str, actual_vocab_size: int, train_fn):
    """Memoized training (reference B8: if .model exists → load, else
    train+save; transform_files_into_tokens.py:273-303)."""
    import os

    if os.path.exists(path):
        model, _ = load_model(path, actual_vocab_size)
        return model, True
    model = train_fn()
    save_model(model, path)
    return model, False
