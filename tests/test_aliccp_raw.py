"""Raw AliCCP parser tests with synthetic \\x01/\\x02/\\x03 lines."""

import numpy as np

from aread_tpu.data.aliccp_raw import (build_feat_map, join_skeleton,
                                       load_common_features, parse_feat_str,
                                       preprocess_raw_aliccp)


def _feat(field, feat, val="1"):
    return f"{field}\x02{feat}\x03{val}"


def test_parse_feat_str_sparse_and_dense():
    s = "\x01".join([_feat("101", "u7"), _feat("508", "f3", "0.25")])
    d = parse_feat_str(s)
    assert d["101"] == "u7"
    assert d["508"] == "f3"     # 508 is sparse AND dense
    assert d["D508"] == "0.25"  # dense value captured separately


def test_join_skeleton_skips_nonclick_purchase():
    common = {"c1": {"101": "u1"}}
    lines = [
        "1,1,0,c1,x," + _feat("205", "i5"),
        "2,0,1,c1,x," + _feat("205", "i6"),  # click=0 & purchase=1 -> skipped
        "3,0,0,c1,x," + _feat("205", "i5"),
    ]
    df, vocab = join_skeleton(lines, common)
    assert len(df) == 2
    assert vocab["205"]["i5"] == 2
    assert (df["101"] == "u1").all()  # common features joined


def test_feat_map_min_freq_and_oov():
    vocab = {k: {} for k in ["101"]}
    vocab["101"] = {"a": 12, "b": 3}
    fm = build_feat_map({**{k: {} for k in
                            __import__("aread_tpu.data.aliccp_raw",
                                       fromlist=["SPARSE_COLUMNS"]).SPARSE_COLUMNS},
                         "101": vocab["101"]})
    assert fm["101"] == {"a": 1}  # b filtered (freq<10); ids start at 1


def test_full_raw_pipeline():
    rng = np.random.default_rng(0)
    common = [f"c{i},1," + _feat("101", f"u{i % 3}") for i in range(4)]

    def skel(n, seed):
        out = []
        r = np.random.default_rng(seed)
        for i in range(n):
            fields = "\x01".join([
                _feat("205", f"i{int(r.integers(0, 4))}"),
                _feat("206", f"d{int(r.integers(0, 3))}"),
                _feat("508", "f1", f"{r.random():.3f}"),
            ])
            out.append(f"{i},{int(r.integers(0, 2))},0,c{int(r.integers(0, 4))},x,{fields}")
        return out

    train, val, test = preprocess_raw_aliccp(
        skel(400, 1), common, skel(100, 2), common)
    assert set(train["click"].unique()) <= {0, 1}
    assert len(val) + len(test) == 100
    # dense scaled to [0, 1]
    assert train["D508"].between(0, 1).all()
    # sparse encoded as small ints with 0 = OOV
    assert train["205"].dtype.kind == "i"
