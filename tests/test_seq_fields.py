"""token_seq / float_seq ingestion (recbole ``Dataset._load_feat`` split
semantics — e.g. ml-1m's ``genre:token_seq`` column)."""

import numpy as np

from recbole_cdr_tpu.data.atomic import load_atomic_file
from recbole_cdr_tpu.utils.enums import FeatureType


def _write(tmp_path, body, name="toy.item"):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


def test_token_seq_split(tmp_path):
    path = _write(
        tmp_path,
        "item_id:token\tgenre:token_seq\n"
        "i1\tAction Comedy\n"
        "i2\tDrama\n"
        "i3\t\n",
    )
    df, ftypes = load_atomic_file(path)
    assert ftypes["genre"] == FeatureType.TOKEN_SEQ
    assert df["genre"].tolist() == [["Action", "Comedy"], ["Drama"], []]


def test_float_seq_split_and_custom_separator(tmp_path):
    path = _write(
        tmp_path,
        "item_id:token\temb:float_seq\n"
        "i1\t0.5,1.5,-2\n"
        "i2\t3\n",
    )
    df, ftypes = load_atomic_file(path, seq_separator=",")
    assert ftypes["emb"] == FeatureType.FLOAT_SEQ
    np.testing.assert_allclose(df["emb"][0], [0.5, 1.5, -2.0])
    np.testing.assert_allclose(df["emb"][1], [3.0])
    assert df["emb"][0].dtype == np.float32


def test_seq_fields_coexist_with_simple(tmp_path):
    """Seq columns route the file to the pandas path; simple columns keep
    their types and order."""
    path = _write(
        tmp_path,
        "item_id:token\trating:float\ttags:token_seq\n"
        "a\t1.0\tx y z\n"
        "b\t2.5\tq\n",
    )
    df, ftypes = load_atomic_file(path)
    assert list(df.columns) == ["item_id", "rating", "tags"]
    assert df["rating"].tolist() == [1.0, 2.5]
    assert df["tags"].tolist() == [["x", "y", "z"], ["q"]]


def test_usecols_with_seq(tmp_path):
    path = _write(
        tmp_path,
        "item_id:token\ttags:token_seq\trating:float\n"
        "a\tx y\t1.0\n",
    )
    df, ftypes = load_atomic_file(path, usecols=["item_id", "tags"])
    assert list(df.columns) == ["item_id", "tags"]
    assert "rating" not in ftypes


def test_dataset_loads_seq_item_feat(tmp_path):
    """End-to-end through CrossDomainSingleDataset: an .item file with a
    token_seq column loads without breaking filtering/remap."""
    d = tmp_path / "toy"
    d.mkdir()
    (d / "toy.inter").write_text(
        "user_id:token\titem_id:token\trating:float\n"
        + "".join(f"u{u}\ti{i}\t{1 + (u + i) % 5}\n" for u in range(8) for i in range(6))
    )
    (d / "toy.item").write_text(
        "item_id:token\tgenre:token_seq\n"
        + "".join(f"i{i}\tg{i % 3} g{(i + 1) % 3}\n" for i in range(6))
    )

    from recbole_cdr_tpu.config import CDRConfig
    from recbole_cdr_tpu.data.dataset import DomainDataset

    config = CDRConfig(
        model="CMF",
        config_dict={
            "state": "ERROR",
            "source_dataset": "toy", "target_dataset": "toy",
            "source_data_path": str(tmp_path), "target_data_path": str(tmp_path),
            "source_load_col": {"inter": ["user_id", "item_id", "rating"],
                                "item": ["item_id", "genre"]},
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
        },
        _cli_args=[],
    )
    ds = DomainDataset(config.update(config["source_domain"]), "source")
    assert ds.item_feat is not None and len(ds.item_feat) > 0
    assert ds.field2type["genre"] == FeatureType.TOKEN_SEQ
    # DomainDataset alone is pre-finalize: cells are raw token lists
    genre_col = ds.item_feat["genre"]
    assert len(genre_col) > 0
    assert all(isinstance(v, list) for v in genre_col)


def test_other_token_fields_remapped(tmp_path):
    """Non-id token / token_seq fields factorize into field2token_id /
    field2id_token with PAD at 0 and integer columns (reference
    remap_others_id / recbole _remap_ID_all semantics)."""
    d = tmp_path / "toy"
    d.mkdir()
    (d / "toy.inter").write_text(
        "user_id:token\titem_id:token\trating:float\n"
        + "".join(f"u{u}\ti{i}\t{1 + (u + i) % 5}\n" for u in range(8) for i in range(6))
    )
    (d / "toy.item").write_text(
        "item_id:token\tgenre:token_seq\tbrand:token\n"
        + "".join(f"i{i}\tg{i % 3} g{(i + 1) % 3}\tb{i % 2}\n" for i in range(6))
    )

    from recbole_cdr_tpu.config import CDRConfig
    from recbole_cdr_tpu.data.dataset import CrossDomainDataset

    config = CDRConfig(
        model="CMF",
        config_dict={
            "state": "ERROR",
            "source_dataset": "toy", "target_dataset": "toy",
            "source_data_path": str(tmp_path), "target_data_path": str(tmp_path),
            "source_load_col": {"inter": ["user_id", "item_id", "rating"],
                                "item": ["item_id", "genre", "brand"]},
            "target_load_col": {"inter": ["user_id", "item_id", "rating"],
                                "item": ["item_id", "genre", "brand"]},
            "source_user_inter_num_interval": "[1,inf)",
            "source_item_inter_num_interval": "[1,inf)",
            "target_user_inter_num_interval": "[1,inf)",
            "target_item_inter_num_interval": "[1,inf)",
            "source_val_interval": None,
            "target_val_interval": None,
        },
        _cli_args=[],
    )
    dataset = CrossDomainDataset(config)
    src = dataset.source_domain_dataset
    assert src.field2id_token["source_genre"][0] == "[PAD]"
    assert set(src.field2id_token["source_genre"][1:]) == {"g0", "g1", "g2"}
    assert set(src.field2id_token["source_brand"][1:]) == {"b0", "b1"}
    # columns are integer ids now
    assert src.item_feat["source_brand"].dtype == np.int64
    for v in src.item_feat["source_genre"]:
        assert v.dtype == np.int64 and (v >= 1).all()
    # round trip: ids map back to the original tokens
    row0 = src.item_feat.iloc[0]
    toks = [src.field2id_token["source_genre"][int(t)] for t in row0["source_genre"]]
    assert toks == ["g0", "g1"]
