"""Connected components + label propagation vs oracles (exact)."""

import numpy as np
import pytest

from pregel_ray import fixtures
from pregel_ray.algorithms.cc import ConnectedComponents
from pregel_ray.algorithms.lpa import LabelPropagation
from pregel_ray.config import EngineConfig
from pregel_ray.engine import Engine
from pregel_ray.graph import UNDIRECTED
from pregel_ray.testing import MicroGraph

from tests.oracles import cc_oracle, lpa_oracle


def run_undirected(algo, tbl, tmp_path, n_vertices=None, cfg=None):
    cfg = cfg or EngineConfig(num_parts=4)
    g = MicroGraph(tbl, str(tmp_path / "shards"), cfg, n_vertices=n_vertices, variant=UNDIRECTED)
    res = Engine(g.shards, cfg).run(algo)
    vt = res.vertex_table().to_pandas()
    return g, res, vt


@pytest.mark.parametrize(
    "maker,n,ncomp",
    [
        (fixtures.g_line4, 4, 1),
        (fixtures.g_cycle3_isolate, 4, 2),
        (fixtures.g_two_cliques_bridge, None, 1),
        (fixtures.g_hub, None, 2),
    ],
)
def test_cc_micrographs(ray_session, tmp_path, maker, n, ncomp):
    tbl = maker()
    g, res, vt = run_undirected(ConnectedComponents(), tbl, tmp_path, n_vertices=n)
    got = g.result_by_id(vt, "label")
    e = tbl.to_pandas()
    nv = n or int(max(e["src"].max(), e["dst"].max())) + 1
    want_ids = cc_oracle(e["src"].to_numpy(), e["dst"].to_numpy(), nv)
    # engine labels are min *vid* of component; map back to original ids:
    # vid order is not id order, so compare partitions not raw labels
    import pandas as pd

    grp_got = pd.Series(got).groupby(got).ngroup()
    grp_want = pd.Series(want_ids).groupby(want_ids).ngroup()
    assert res.converged
    assert len(set(got)) == ncomp
    # same partition structure
    assert (
        pd.crosstab(grp_got, grp_want).astype(bool).sum().sum() == ncomp
    ), "component partitions differ"


def test_cc_labels_are_min_vid(ray_session, tmp_path):
    tbl = fixtures.g_two_cliques_bridge()
    g, res, vt = run_undirected(ConnectedComponents(), tbl, tmp_path)
    assert (vt["label"] == vt["vid"].min()).all()


def test_lpa_two_cliques(ray_session, tmp_path):
    tbl = fixtures.g_two_cliques_bridge()
    g, res, vt = run_undirected(LabelPropagation(max_iters=30), tbl, tmp_path)
    got = g.result_by_id(vt, "label")
    e = tbl.to_pandas()
    nv = int(max(e["src"].max(), e["dst"].max())) + 1
    # oracle runs in *vid space* (labels are vids): map edges to vids
    vids = g.vid_of  # ids 0..7 → vids
    want_vid = lpa_oracle(
        vids[e["src"].to_numpy()], vids[e["dst"].to_numpy()], e["w"].to_numpy(),
        int(vids.max()) + 1, max_iters=30,
    )
    np.testing.assert_array_equal(got, want_vid[vids])


def test_lpa_exact_match_on_random_graph(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    n = 40
    src = rng.integers(0, n, 150)
    dst = rng.integers(0, n, 150)
    keep = src != dst
    tbl = fixtures.edge_table(list(zip(src[keep].tolist(), dst[keep].tolist())))
    g, res, vt = run_undirected(LabelPropagation(max_iters=10), tbl, tmp_path, n_vertices=n)
    got = g.result_by_id(vt, "label")
    # symmetrized weighted view for the oracle (sum both directions, no self)
    import pandas as pd

    e = tbl.to_pandas()
    sym = pd.concat(
        [e, e.rename(columns={"src": "dst", "dst": "src"})[["src", "dst", "w"]]]
    )
    sym = sym[sym["src"] != sym["dst"]].groupby(["src", "dst"], as_index=False)["w"].sum()
    vids = g.vid_of
    want_vid = lpa_oracle(
        vids[sym["src"].to_numpy()], vids[sym["dst"].to_numpy()], sym["w"].to_numpy(),
        int(vids.max()) + 1, max_iters=10,
    )
    np.testing.assert_array_equal(got, want_vid[vids])
