"""tools/run_real_parity.py — the real-data parity harness, on fixtures.

VERDICT r4 item 7: the moment real ShapeNet-Part/ACD data appears,
parity must be one command.  These tests prove the harness against the
synthetic fixtures: ``check`` accepts exactly the layout the reference
loaders expect (``data_utils/ShapeNetDataLoader.py:29-52, 302-327``)
and rejects the failure modes it guards, and ``dryrun`` (slow tier)
runs the full check -> train -> eval -> export procedure end to end.
"""

import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
    osp.abspath(__file__))), "tools"))

from fixtures import make_acd_fixture, make_shapenet_fixture  # noqa: E402
from run_real_parity import check_acd, check_shapenet, main  # noqa: E402


class TestCheck:
    def test_valid_layout_passes(self, tmp_path):
        sn = make_shapenet_fixture(str(tmp_path / "shapenet"))
        acd = make_acd_fixture(str(tmp_path / "acd"))
        assert check_shapenet(sn) == []
        assert check_acd(acd) == []
        assert main(["check", "--data_root", sn, "--ss_path", acd]) == 0

    def test_missing_catfile(self, tmp_path):
        problems = check_shapenet(str(tmp_path))
        assert len(problems) == 1
        assert "synsetoffset2category" in problems[0]

    def test_missing_split_json(self, tmp_path):
        sn = make_shapenet_fixture(str(tmp_path / "shapenet"))
        os.remove(osp.join(sn, "train_test_split",
                           "shuffled_val_file_list.json"))
        problems = check_shapenet(sn)
        assert any("shuffled_val_file_list" in p for p in problems)

    def test_wrong_column_count(self, tmp_path):
        # no normals -> 4 columns, not the reference's 7
        sn = make_shapenet_fixture(str(tmp_path / "shapenet"),
                                   normals=False)
        problems = check_shapenet(sn)
        assert any("7 columns" in p for p in problems)

    def test_out_of_range_part_labels(self, tmp_path):
        sn = make_shapenet_fixture(str(tmp_path / "shapenet"))
        # corrupt one Airplane file with a Chair-range label
        d = osp.join(sn, "02691156")
        fn = osp.join(d, sorted(os.listdir(d))[0])
        data = np.loadtxt(fn).astype(np.float32)
        data[:, -1] = 13.0
        np.savetxt(fn, data, fmt="%.6f")
        problems = check_shapenet(sn)
        assert any("outside" in p for p in problems)

    def test_acd_rejects_flat_folder(self, tmp_path):
        # .npy files directly in the root (no category subfolders)
        root = str(tmp_path / "acd")
        os.makedirs(root)
        np.save(osp.join(root, "x.npy"), np.zeros((10, 4), np.float32))
        problems = check_acd(root)
        assert any("subfolder" in p for p in problems)

    def test_acd_rejects_narrow_npy(self, tmp_path):
        root = str(tmp_path / "acd" / "shapes")
        os.makedirs(root)
        np.save(osp.join(root, "x.npy"), np.zeros((10, 3), np.float32))
        problems = check_acd(str(tmp_path / "acd"))
        assert any(">=4" in p for p in problems)


@pytest.mark.slow
class TestDryrun:
    def test_dryrun_end_to_end(self, tmp_path):
        """check -> micro train -> standalone eval -> .pth export, on
        generated fixtures in the real layout."""
        rc = main(["dryrun", "--out", str(tmp_path / "d"), "--keep"])
        assert rc == 0
        assert osp.isfile(str(tmp_path / "d" / "export.pth"))
