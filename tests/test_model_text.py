"""Text model I/O: export -> import round trip is bit-exact, and a
bundle loaded from the text form produces IDENTICAL mentions through
the tagger (interop parity with the parquet model)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


def test_text_roundtrip_bit_exact(tiny_dir, tmp_path):
    from ner_ray.state.model import export_model_text, import_model_text

    tbl = pq.read_table(f"{tiny_dir}/model.parquet")
    text = export_model_text(tbl)
    back, pattern_text = import_model_text(text)
    assert back.column("feature").to_pylist() == \
        tbl.column("feature").to_pylist()
    assert back.column("label").to_pylist() == tbl.column("label").to_pylist()
    a = np.array(back.column("weight").to_pylist())
    b = np.array(tbl.column("weight").to_pylist())
    assert (a == b).all()           # bit-exact via float.hex
    assert "U" in pattern_text and pattern_text.strip().endswith("B")
    # second round trip is a fixpoint
    assert export_model_text(back, pattern_text) == text


def test_text_model_serves_identically(ray_session, tiny_dir, tmp_path):
    from ner_ray.stages.tagger import tag_spans
    from ner_ray.state.model import (
        GAZ_VALUES,
        ModelBundle,
        load_model_text,
        save_model_text,
    )

    out = str(tmp_path / "model.txt")
    save_model_text(f"{tiny_dir}/model.parquet", out)
    b_txt = load_model_text(out, f"{tiny_dir}/alias.parquet")
    b_pq = ModelBundle.load(f"{tiny_dir}/model.parquet",
                            f"{tiny_dir}/alias.parquet")

    docs = pq.read_table(f"{tiny_dir}/docs.parquet").to_pylist()
    texts = pd.Series([s["text"] for d in docs for s in d["spans"]
                       if s["kind"] == "text"][:150], dtype=object)

    def run(b):
        gid = b.value_ids["gaz"]
        gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
        return tag_spans(texts, b, gaz_row).to_pylist()

    m_txt, m_pq = run(b_txt), run(b_pq)
    assert m_txt == m_pq
    assert sum(len(m) for m in m_pq) > 0


def test_import_rejects_garbage():
    from ner_ray.state.model import import_model_text

    with pytest.raises(ValueError):
        import_model_text("not a model\n")
    with pytest.raises(ValueError):
        import_model_text("#ner_ray_model#1\n#patterns#0\n#features#2\n"
                          "low:0:a\tO\t0x1p+0\n")  # truncated
