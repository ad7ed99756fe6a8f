"""Bucketed hash join / as-of join vs pandas ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def frames(ray_session):
    import ray.data

    rng = np.random.default_rng(4)
    left = pd.DataFrame({
        "k": rng.integers(0, 200, size=2000).astype(str),
        "lv": rng.integers(0, 1000, size=2000),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 300, size=1500).astype(str),
        "rv": rng.integers(0, 1000, size=1500),
    })
    return (ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(4), left, right)


def test_inner_join_matches_pandas(frames):
    from raysketch.stages.joins import bucket_hash_join

    lds, rds, left, right = frames
    got = bucket_hash_join(lds, rds, on="k", num_buckets=16).to_pandas()
    exp = left.merge(right, on="k", how="inner")
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].itertuples(index=False)))
    assert key(got) == key(exp)


def test_left_join_matches_pandas(frames):
    from raysketch.stages.joins import bucket_hash_join

    lds, rds, left, right = frames
    got = bucket_hash_join(lds, rds, on="k", how="left", num_buckets=16).to_pandas()
    exp = left.merge(right, on="k", how="left")
    assert len(got) == len(exp)
    assert got["rv"].isna().sum() == exp["rv"].isna().sum()


def test_asof_join(ray_session):
    import ray.data

    from raysketch.stages.joins import asof_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame({
        "k": rng.integers(0, 10, size=500).astype(str),
        "ts": pd.to_datetime(rng.integers(0, 10**6, size=500), unit="s"),
        "lv": np.arange(500),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 10, size=300).astype(str),
        "ts": pd.to_datetime(rng.integers(0, 10**6, size=300), unit="s"),
        "rv": np.arange(300),
    })
    got = asof_join(ray.data.from_pandas(left).repartition(3),
                    ray.data.from_pandas(right).repartition(3),
                    key="k", ts="ts", num_buckets=8).to_pandas()
    exp = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                        on="ts", by="k")
    assert len(got) == len(exp)
    g = got.sort_values("lv").reset_index(drop=True)
    e = exp.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_series_equal(
        g["rv"].astype("float64"), e["rv"].astype("float64"), check_names=False
    )


def test_asof_join_no_right_match(ray_session):
    """Keys present only on the left must survive with null right values."""
    import ray.data

    from raysketch.stages.joins import asof_join

    left = pd.DataFrame({"k": ["a", "b"], "ts": pd.to_datetime([1000, 2000], unit="s"),
                         "lv": [1, 2]})
    right = pd.DataFrame({"k": ["a"], "ts": pd.to_datetime([500], unit="s"),
                          "rv": [7]})
    got = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    key="k", ts="ts", num_buckets=4).to_pandas()
    assert len(got) == 2
    a = got[got["k"] == "a"].iloc[0]
    b = got[got["k"] == "b"].iloc[0]
    assert a["rv"] == 7
    assert pd.isna(b["rv"])


def test_outer_join(frames):
    from raysketch.stages.joins import bucket_hash_join

    lds, rds, left, right = frames
    got = bucket_hash_join(lds, rds, on="k", how="outer", num_buckets=16).to_pandas()
    exp = left.merge(right, on="k", how="outer")
    assert len(got) == len(exp)
    assert got["lv"].isna().sum() == exp["lv"].isna().sum()
    assert got["rv"].isna().sum() == exp["rv"].isna().sum()


def test_anti_join_matches_pandas(frames):
    from raysketch.stages.joins import bucket_anti_join

    lds, rds, left, right = frames
    got = bucket_anti_join(lds, rds, on="k", num_buckets=16).to_pandas()
    exp = left[~left["k"].isin(set(right["k"]))]
    key = lambda df: sorted(map(tuple, df[["k", "lv"]].itertuples(index=False)))
    assert key(got) == key(exp)
    assert len(got) > 0  # fixture guarantees some keys only on the left


def test_semi_join_matches_pandas(frames):
    from raysketch.stages.joins import bucket_semi_join

    lds, rds, left, right = frames
    got = bucket_semi_join(lds, rds, on="k", num_buckets=16).to_pandas()
    exp = left[left["k"].isin(set(right["k"]))]
    key = lambda df: sorted(map(tuple, df[["k", "lv"]].itertuples(index=False)))
    assert key(got) == key(exp)
    # each left row appears at most once even with duplicate right keys
    assert len(got) == len(exp)


def test_anti_semi_preserve_int64_and_63bit_ids(ray_session):
    """Code-review r02: the null-padded union upcast left int64 columns
    to float64 inside bucket groups, corrupting ids beyond 2^53. Output
    dtypes and exact 63-bit values must survive."""
    import ray.data

    from raysketch.stages.joins import bucket_anti_join, bucket_semi_join

    big = np.array([2**62 + 3, 2**62 + 5, 2**53 + 11, 7], dtype=np.int64)
    left = pd.DataFrame({"k": ["a", "b", "c", "d"], "big_id": big})
    right = pd.DataFrame({"k": ["b", "d"]})
    lds = ray.data.from_pandas(left).repartition(2)
    rds = ray.data.from_pandas(right)
    anti = bucket_anti_join(lds, rds, on="k").to_pandas()
    semi = bucket_semi_join(lds, rds, on="k").to_pandas()
    assert anti["big_id"].dtype == np.int64 and semi["big_id"].dtype == np.int64
    assert sorted(anti["big_id"]) == sorted([2**62 + 3, 2**53 + 11])
    assert sorted(semi["big_id"]) == sorted([2**62 + 5, 7])


class TestRangeJoin:
    """range_join vs a brute-force pandas interval match."""

    def _data(self, seed=9, n_l=400, n_r=900, numeric=False):
        rng = np.random.default_rng(seed)
        mk_ts = (lambda v: v.astype(np.int64)) if numeric else (
            lambda v: pd.Timestamp("2026-01-01").to_numpy()
            + v.astype("timedelta64[s]"))
        left = pd.DataFrame({
            "k": rng.integers(0, 40, size=n_l),
            "ts": mk_ts(rng.integers(0, 100_000, size=n_l)),
            "lid": np.arange(n_l, dtype=np.int64),
        })
        right = pd.DataFrame({
            "k": rng.integers(0, 50, size=n_r),
            "rts": mk_ts(rng.integers(0, 100_000, size=n_r)),
            "rid": np.arange(n_r, dtype=np.int64),
        })
        return left, right

    def _brute(self, left, right, lo, hi):
        out = []
        for _, lrow in left.iterrows():
            m = right[(right["k"] == lrow["k"])
                      & (right["rts"] >= lrow["ts"] + lo)
                      & (right["rts"] < lrow["ts"] + hi)]
            out.append((int(lrow["lid"]), sorted(m["rid"].tolist())))
        return dict(out)

    @pytest.mark.parametrize("numeric", [False, True])
    def test_count_and_inner_match_brute(self, ray_session, numeric):
        import ray.data

        from raysketch.stages.joins import range_join

        left, right = self._data(numeric=numeric)
        lo, hi = ((-3600, 0) if numeric
                  else (pd.Timedelta(hours=-1), pd.Timedelta(0)))
        exp = self._brute(left, right, lo, hi)
        lds = ray.data.from_pandas(left).repartition(3)
        rds = ray.data.from_pandas(right).repartition(5)
        cnt = range_join(lds, rds, key="k", left_ts="ts", right_ts="rts",
                         lo=lo, hi=hi, how="count", num_buckets=8).to_pandas()
        assert len(cnt) == len(left)
        got_counts = dict(zip(cnt["lid"].astype(int), cnt["n_matches"].astype(int)))
        assert got_counts == {k: len(v) for k, v in exp.items()}
        inner = range_join(lds, rds, key="k", left_ts="ts", right_ts="rts",
                           lo=lo, hi=hi, how="inner", num_buckets=8).to_pandas()
        got_pairs = {}
        for lid, rid in zip(inner["lid"].astype(int), inner["rid"].astype(int)):
            got_pairs.setdefault(lid, []).append(rid)
        assert {k: sorted(v) for k, v in got_pairs.items()} == \
               {k: v for k, v in exp.items() if v}

    def test_boundary_inclusive_exclusive(self, ray_session):
        import ray.data

        from raysketch.stages.joins import range_join

        left = pd.DataFrame({"k": [1], "ts": [100], "lid": [0]})
        right = pd.DataFrame({"k": [1, 1, 1, 1], "rts": [89, 90, 99, 100],
                              "rid": [0, 1, 2, 3]})
        out = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                         key="k", left_ts="ts", right_ts="rts",
                         lo=-10, hi=0, how="inner", num_buckets=4).to_pandas()
        # [90, 100): rts 90 and 99 in; 89 and 100 out
        assert sorted(out["rid"].tolist()) == [1, 2]

    def test_empty_right(self, ray_session):
        import ray.data

        from raysketch.stages.joins import range_join

        left = pd.DataFrame({"k": [1, 2], "ts": [5, 6], "lid": [0, 1]})
        right = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                              "rts": pd.Series([], dtype="int64"),
                              "rid": pd.Series([], dtype="int64")})
        out = range_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                         key="k", left_ts="ts", right_ts="rts",
                         lo=-10, hi=10, how="count", num_buckets=4).to_pandas()
        assert out["n_matches"].tolist() == [0, 0]
        assert out["lid"].dtype == np.int64


def test_bloom_prefilter_join(ray_session):
    """bloom_prefilter=True prunes non-matching left rows before the
    shuffle but the join result is IDENTICAL (false positives fall out
    of the merge); non-inner joins reject the option."""
    import ray.data

    from raysketch.stages.joins import _build_key_bloom, bucket_hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 10_000, size=5000),
                         "lv": np.arange(5000)})
    right = pd.DataFrame({"k": rng.integers(0, 100, size=300),
                          "rv": np.arange(300)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)
    plain = bucket_hash_join(lds, rds, on="k", num_buckets=8).to_pandas()
    pref = bucket_hash_join(lds, rds, on="k", num_buckets=8,
                            bloom_prefilter=True).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].itertuples(index=False)))
    assert key(pref) == key(plain)
    # the filter really prunes: ~99% of left keys cannot match
    bf = _build_key_bloom(rds, "k", 1 << 23)
    kept = bf.contains_batch(left["k"].tolist()).sum()
    assert kept < len(left) * 0.05
    with pytest.raises(ValueError, match="inner"):
        bucket_hash_join(lds, rds, on="k", how="left", bloom_prefilter=True)


def test_full_outer_join_typed_fill(ray_session):
    """FULL OUTER with integer fills: unmatched rows of BOTH sides
    survive, filled int columns stay int64 (exact beyond 2^53), and the
    result matches a pandas outer merge with the same fills."""
    import ray.data

    from raysketch.stages.joins import bucket_full_outer_join

    big = np.int64(3) << 60
    left = pd.DataFrame({
        "k": np.array([1, 2, 3, 5, 7], dtype=np.int64),
        "lv": np.array([big + 1, big + 2, big + 3, big + 5, big + 7],
                       dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.array([2, 3, 4, 6, 7], dtype=np.int64),
        "rv": np.array([big + 12, big + 13, big + 14, big + 16, big + 17],
                       dtype=np.int64),
    })
    got = bucket_full_outer_join(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right).repartition(2),
        on="k", num_buckets=8, fill={"lv": 0, "rv": 0},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    # pandas reference built on nullable Int64 — a float64 round-trip
    # would itself corrupt big+2 (the exact failure mode under test)
    exp = left.astype({"lv": "Int64"}).merge(
        right.astype({"rv": "Int64"}), on="k", how="outer")
    exp["lv"] = exp["lv"].fillna(0).astype(np.int64)
    exp["rv"] = exp["rv"].fillna(0).astype(np.int64)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert got.dtypes.to_dict() == exp.dtypes.to_dict()
    pd.testing.assert_frame_equal(got[["k", "lv", "rv"]], exp[["k", "lv", "rv"]])
    # both unmatched directions genuinely present and exact
    assert (got.loc[got["k"] == 4, "lv"] == 0).all()
    assert (got.loc[got["k"] == 5, "rv"] == 0).all()
    assert got.loc[got["k"] == 7, "rv"].iloc[0] == big + 17


def test_full_outer_join_rejects_unknown_fill(ray_session):
    import ray.data

    from raysketch.stages.joins import bucket_full_outer_join

    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "lv": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "rv": [2]}))
    with pytest.raises(ValueError, match="not in the output"):
        bucket_full_outer_join(l, r, on="k", fill={"nope": 0})


class TestBandCountSelf:
    def _brute(self, v, d):
        v = np.asarray(v, dtype=np.int64)
        return np.array([(np.abs(v - x) <= d).sum() for x in v])

    def test_matches_brute_force(self, ray_session):
        import ray

        rng = np.random.default_rng(7)
        v = rng.integers(0, 100_000, size=2_000).astype(np.int64)
        df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64), "v": v})
        from raysketch.stages.joins import band_count_self

        out = band_count_self(
            ray.data.from_pandas(df).repartition(5), on="v", d=500,
            carry=("id",), num_buckets=16,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        want = self._brute(v, 500)
        assert (out["n_near"].to_numpy() == want).all()

    def test_halo_cluster_at_bucket_boundary(self, ray_session):
        """A dense cluster straddling a range boundary: every count
        crosses the bucket edge, so only the halo replication keeps the
        result exact."""
        import ray

        # bounds (0, 6399) with 8 buckets -> width 800; cluster at
        # 795..805 straddles the 800 boundary
        v = np.r_[np.arange(795, 806), np.int64(0), np.int64(6399)]
        df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64),
                           "v": v.astype(np.int64)})
        from raysketch.stages.joins import band_count_self

        out = band_count_self(
            ray.data.from_pandas(df).repartition(3), on="v", d=7,
            carry=("id",), num_buckets=8,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        want = self._brute(v, 7)
        assert (out["n_near"].to_numpy() == want).all()
        # the cluster's interior rows must see neighbors on BOTH sides
        assert out["n_near"].to_numpy()[:11].max() > 1

    def test_width_floor_covers_halo(self, ray_session):
        """d wider than span/num_buckets: the 2d+1 width floor kicks in
        (halo may only reach adjacent ranges)."""
        import ray

        v = np.arange(0, 200, dtype=np.int64)
        df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64), "v": v})
        from raysketch.stages.joins import band_count_self

        out = band_count_self(
            ray.data.from_pandas(df).repartition(4), on="v", d=80,
            carry=("id",), num_buckets=64,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        assert (out["n_near"].to_numpy() == self._brute(v, 80)).all()

    def test_duplicate_values_inclusive_boundary(self, ray_session):
        import ray

        v = np.array([10, 10, 10, 15, 20, 25, 30], dtype=np.int64)
        df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64), "v": v})
        from raysketch.stages.joins import band_count_self

        out = band_count_self(
            ray.data.from_pandas(df), on="v", d=5, carry=("id",),
            num_buckets=4,
        ).to_pandas().sort_values("id").reset_index(drop=True)
        # boundary is inclusive: 10 matches 15 and vice versa
        assert (out["n_near"].to_numpy() == self._brute(v, 5)).all()


class TestIntervalOverlapCount:
    def test_matches_brute_force(self, ray_session):
        import ray

        rng = np.random.default_rng(5)
        nl, nr = 400, 300
        a = rng.integers(0, 100_000, size=nl).astype(np.int64)
        b = a + rng.integers(0, 30_000, size=nl)  # spans cross buckets
        lo = rng.integers(0, 100_000, size=nr).astype(np.int64)
        hi = lo + rng.integers(0, 20_000, size=nr)
        left = pd.DataFrame({"id": np.arange(nl, dtype=np.int64),
                             "a": a, "b": b})
        right = pd.DataFrame({"lo": lo, "hi": hi})
        from raysketch.stages.joins import interval_overlap_count

        out = interval_overlap_count(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            left_cols=("a", "b"), id_cols=("id",), num_buckets=8,
        ).sort_values("id").reset_index(drop=True)
        want = np.array([((lo <= b[i]) & (hi >= a[i])).sum()
                         for i in range(nl)])
        assert (out["n_overlaps"].to_numpy() == want).all()
        assert len(out) == nl  # zero-overlap intervals kept

    def test_point_intervals_and_touching_boundaries(self, ray_session):
        """Closed-ended semantics: touching endpoints overlap; point
        intervals work; identical intervals count multiply."""
        import ray

        left = pd.DataFrame({"id": np.arange(3, dtype=np.int64),
                             "a": np.array([10, 50, 100], dtype=np.int64),
                             "b": np.array([20, 50, 200], dtype=np.int64)})
        right = pd.DataFrame({
            "lo": np.array([20, 50, 50, 0], dtype=np.int64),
            "hi": np.array([30, 50, 50, 9], dtype=np.int64)})
        from raysketch.stages.joins import interval_overlap_count

        out = interval_overlap_count(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            left_cols=("a", "b"), id_cols=("id",), num_buckets=4,
        ).sort_values("id").reset_index(drop=True)
        # id0: [10,20] touches [20,30] → 1; id1: point 50 matches the
        # two [50,50] copies → 2; id2: none
        assert list(out["n_overlaps"]) == [1, 2, 0]

    def test_empty_right(self, ray_session):
        import ray

        left = pd.DataFrame({"id": np.array([0], dtype=np.int64),
                             "a": np.array([1], dtype=np.int64),
                             "b": np.array([5], dtype=np.int64)})
        right = pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                              "hi": pd.Series([], dtype=np.int64)})
        from raysketch.stages.joins import interval_overlap_count

        out = interval_overlap_count(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            left_cols=("a", "b"), id_cols=("id",))
        assert list(out["n_overlaps"]) == [0]


def test_worker_death_mid_band_and_interval_joins(ray_session, tmp_path):
    """A worker dying mid-batch inside the new exchange operators
    (band join, interval-overlap join) is retried transparently and
    the results equal an undisturbed run — the halo/ownership
    decompositions stay exact under task re-execution."""
    import os

    import ray

    rng = np.random.default_rng(9)
    v = rng.integers(0, 50_000, size=1500).astype(np.int64)
    df = pd.DataFrame({"id": np.arange(len(v), dtype=np.int64), "v": v})
    from raysketch.stages.joins import band_count_self, interval_overlap_count

    clean = band_count_self(ray.data.from_pandas(df).repartition(4),
                            on="v", d=300, carry=("id",),
                            num_buckets=8).to_pandas() \
        .sort_values("id").reset_index(drop=True)

    marker = str(tmp_path / "band_died")

    def flaky(t: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)
        return t

    flaky_ds = ray.data.from_pandas(df).repartition(4) \
        .map_batches(flaky, batch_format="pyarrow")
    got = band_count_self(flaky_ds, on="v", d=300, carry=("id",),
                          num_buckets=8).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert os.path.exists(marker)
    pd.testing.assert_frame_equal(got, clean)

    # interval overlap twin
    a = rng.integers(0, 50_000, size=400).astype(np.int64)
    b = a + rng.integers(0, 5_000, size=400)
    lo = rng.integers(0, 50_000, size=300).astype(np.int64)
    hi = lo + rng.integers(0, 3_000, size=300)
    left = pd.DataFrame({"id": np.arange(400, dtype=np.int64),
                         "a": a, "b": b})
    right = pd.DataFrame({"lo": lo, "hi": hi})
    clean2 = interval_overlap_count(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right).repartition(2),
        left_cols=("a", "b"), id_cols=("id",), num_buckets=8) \
        .sort_values("id").reset_index(drop=True)
    marker2 = str(tmp_path / "iv_died")

    def flaky2(t: pa.Table) -> pa.Table:
        if not os.path.exists(marker2):
            open(marker2, "w").write("x")
            os._exit(1)
        return t

    got2 = interval_overlap_count(
        ray.data.from_pandas(left).repartition(3)
        .map_batches(flaky2, batch_format="pyarrow"),
        ray.data.from_pandas(right).repartition(2),
        left_cols=("a", "b"), id_cols=("id",), num_buckets=8) \
        .sort_values("id").reset_index(drop=True)
    assert os.path.exists(marker2)
    pd.testing.assert_frame_equal(got2, clean2)
