"""The learning-proof dataset generators emit on-disk layouts the real
dataset classes consume (stickfigure video -> DanceDataset, cartoon-face
video -> FaceDataset) — the harness behind the hardware efficacy runs."""

import argparse
import os
import subprocess
import sys

import numpy as np
import pytest

from gfla_tpu.data.animation_data import DanceDataset, FaceDataset

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", script), *args],
        check=True, cwd=ROOT, capture_output=True,
    )


@pytest.fixture(scope="module")
def stick_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stickdance"))
    _run("make_stickfigure_video_dataset.py", "--root", root,
         "--sequences", "3", "--frames", "8", "--size", "64")
    return root


@pytest.fixture(scope="module")
def face_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthface"))
    _run("make_synthface_video_dataset.py", "--root", root,
         "--sequences", "3", "--test-sequences", "1", "--frames", "8")
    return root


def _anim_opt(dataroot, **over):
    opt = argparse.Namespace(
        dataroot=dataroot, phase="train", isTrain=True, load_size=64,
        n_frames_total=4, max_frames_per_gpu=2, max_t_step=1, seed=0,
        n_frames_pre_load_test=2, use_mask=False, use_kp=False,
        no_canny_edge=False, no_dist_map=False, old_size=None,
        sub_dataset="fashion",
    )
    for k, v in over.items():
        setattr(opt, k, v)
    return opt


class TestStickfigureVideo:
    def test_dance_dataset_consumes_layout(self, stick_root):
        opt = DanceDataset.apply_defaults(
            _anim_opt(stick_root, no_device_encode=True), True)
        ds = DanceDataset(opt)
        assert len(ds) == 3
        item = ds[0]
        assert item["P_all"].shape == (4, 64, 64, 3)
        assert item["BP_all"].shape == (4, 64, 64, 20)
        assert item["ref_image"].shape == (64, 64, 3)
        assert item["ref_skeleton"].shape == (64, 64, 20)
        assert -1.0 <= item["P_all"].min() and item["P_all"].max() <= 1.0
        # 17 heatmap channels peak near 1 at the joints; 3 limb-RGB in [0,1]
        assert item["BP_all"][..., :17].max() > 0.5
        assert item["BP_all"][..., 17:].max() <= 1.0

    def test_device_encode_keys(self, stick_root):
        """Default train path ships coords + limb RGB for device assembly."""
        opt = DanceDataset.apply_defaults(_anim_opt(stick_root), True)
        item = DanceDataset(opt)[0]
        assert "BP_all" not in item and "ref_skeleton" not in item
        assert item["KP_all"].shape == (4, 17, 2)
        assert item["BP_all_rgb"].shape == (4, 64, 64, 3)
        assert item["ref_KP"].shape == (17, 2)
        assert item["ref_rgb"].shape == (64, 64, 3)

    def test_frames_move(self, stick_root):
        opt = DanceDataset.apply_defaults(
            _anim_opt(stick_root, angle=None, shift=None, scale=None), True)
        item = DanceDataset(opt)[1]
        # consecutive frames of a sequence differ (motion), same identity
        assert np.abs(item["P_all"][0] - item["P_all"][-1]).mean() > 1e-3


class TestSynthFaceVideo:
    def test_face_dataset_consumes_layout(self, face_root):
        opt = FaceDataset.apply_defaults(_anim_opt(face_root), True)
        ds = FaceDataset(opt)
        assert len(ds) == 3
        item = ds[0]
        assert item["P_all"].shape == (4, 64, 64, 3)
        assert item["BP_all"].shape == (4, 64, 64, 16)
        assert item["ref_image"].shape == (64, 64, 3)
        assert item["ref_skeleton"].shape == (64, 64, 16)
        assert -1.0 <= item["P_all"].min() and item["P_all"].max() <= 1.0
        # channel 0 = edge map with drawn facial curves; 1-14 = distance
        # transforms in [0, 1]; 15 = raw part-label map (0-6)
        assert item["BP_all"][..., 0].max() > 0.5
        assert item["BP_all"][..., 1:15].min() >= 0.0
        assert item["BP_all"][..., 1:15].max() <= 1.0
        labels = item["BP_all"][..., 15]
        assert labels.max() >= 5.0  # mouth label present
        assert set(np.unique(labels)) <= set(range(7))

    def test_structure_tracks_motion(self, face_root):
        opt = FaceDataset.apply_defaults(_anim_opt(face_root), True)
        item = FaceDataset(opt)[2]
        # the edge map moves with the landmarks across the window
        assert np.abs(
            item["BP_all"][0, ..., 0] - item["BP_all"][-1, ..., 0]
        ).max() > 0.5

    def test_test_phase_chunking(self, face_root):
        opt = FaceDataset.apply_defaults(
            _anim_opt(face_root, phase="test", isTrain=False), False)
        ds = FaceDataset(opt)
        assert len(ds) == 4  # 1 seq x 8 frames / chunks of 2
        item = ds[0]
        assert item["P_all"].shape == (2, 64, 64, 3)
        assert item["change_seq"] in (True, False)


class TestSynthShapeNet:
    @pytest.fixture(scope="class")
    def shapenet_root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("synthshapenet"))
        _run("make_synth_shapenet_dataset.py", "--root", root,
             "--train-objects", "3", "--test-objects", "1", "--size", "64")
        return root

    def _opt(self, dataroot, **over):
        opt = argparse.Namespace(
            dataroot=dataroot, phase="train", isTrain=True, load_size=64,
            old_size=None, ang_skip=20, label_nc_h=18, label_nc_v=3,
            sub_dataset_model="car",
        )
        for k, v in over.items():
            setattr(opt, k, v)
        return opt

    def test_shapenet_dataset_consumes_layout(self, shapenet_root):
        from gfla_tpu.data.shapenet_data import ShapeNetDataset

        ds = ShapeNetDataset(ShapeNetDataset.apply_defaults(
            self._opt(shapenet_root), True))
        assert len(ds) == 3 * 18 * 3
        item = ds[0]
        assert item["P1"].shape == (64, 64, 3)
        assert item["P2"].shape == (64, 64, 3)
        assert -1.0 <= item["P1"].min() and item["P1"].max() <= 1.0
        # raw pose labels obey the on-device one-hot encoding ranges
        for key in ("BP1", "BP2"):
            az10, elev = item[key]
            assert 0 <= az10 // 2 < 18 and az10 % 2 == 0
            assert elev in (0, 10, 20)

    def test_views_differ_objects_consistent(self, shapenet_root):
        import h5py

        h5 = h5py.File(
            os.path.join(shapenet_root, "data_car.hdf5"), "r")
        try:
            a = h5["obj000_0_0"]["image"][()]
            b = h5["obj000_8_0"]["image"][()]
            # different azimuths of one object render differently
            assert np.abs(a.astype(int) - b.astype(int)).mean() > 1.0
            # opposite azimuths are distinct too (front bumper marker)
            c = h5["obj000_18_0"]["image"][()]
            assert np.abs(a.astype(int) - c.astype(int)).mean() > 1.0
        finally:
            h5.close()

    def test_test_phase_sweep(self, shapenet_root):
        from gfla_tpu.data.shapenet_data import ShapeNetDataset

        ds = ShapeNetDataset(ShapeNetDataset.apply_defaults(
            self._opt(shapenet_root, phase="test", isTrain=False), False))
        assert len(ds) == 1
        item = ds[0]
        assert item["P2"].shape == (18, 64, 64, 3)
        assert item["BP2"].shape == (18, 2)


class TestSynthH36MKeypoints:
    @pytest.fixture(scope="class")
    def kp_root(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("synthkp"))
        _run("make_synth_h36m_keypoints.py", "--out", root,
             "--frames", "200", "--cameras", "1")
        return root

    def test_keypoint_dataset_consumes_layout(self, kp_root):
        from gfla_tpu.data.keypoint_data import KeypointDataset

        opt = KeypointDataset.apply_defaults(argparse.Namespace(
            phase="train", isTrain=True, seed=0,
            gt_path=os.path.join(kp_root, "data_2d_h36m_gt.npz"),
            input_path=os.path.join(kp_root, "data_2d_h36m_synth_noisy.npz"),
        ), True)
        ds = KeypointDataset(opt)
        # 5 train subjects (S9 excluded) x 2 actions x 1 camera
        assert len(ds) == 10
        item = ds[0]
        P, R = opt.n_frames_pre_load, opt.n_receptive
        assert item["gt_data"].shape == (P, 34)
        assert item["input_data"].shape == (P + R - 1, 34)
        # normalized to roughly [-1, 1] (scale aug can push slightly out)
        assert np.abs(item["gt_data"]).max() < 2.0
        # input = gt + noise: centered input window is close to gt but
        # not equal (the denoiser has signal to remove)
        off = (R - 1) // 2
        diff = item["input_data"][off:off + P] - item["gt_data"]
        assert 0 < np.abs(diff).mean() < 0.1

    def test_eval_subject_split(self, kp_root):
        from gfla_tpu.data.keypoint_data import KeypointDataset

        opt = KeypointDataset.apply_defaults(argparse.Namespace(
            phase="test", isTrain=False, seed=0,
            gt_path=os.path.join(kp_root, "data_2d_h36m_gt.npz"),
            input_path=os.path.join(kp_root, "data_2d_h36m_synth_noisy.npz"),
        ), False)
        ds = KeypointDataset(opt)
        assert len(ds) == 2  # S9 only x 2 actions x 1 camera
        item = ds[0]
        assert item["out_path"].startswith("S9")


class TestDanceDeviceEncode:
    def test_matches_loader_maps(self, stick_root):
        """--no_device_encode (loader-built 20-ch maps) and the default
        device encode (coords + limb RGB assembled in prepare_batch) give
        the same BP_all / ref_skeleton."""
        from gfla_tpu.data import collate
        from gfla_tpu.parallel import make_mesh
        from train import prepare_batch

        # seed must be nonzero: the dataset maps seed=0 -> RandomState(None)
        mk = lambda off: DanceDataset.apply_defaults(
            _anim_opt(stick_root, no_device_encode=off, seed=7), True)
        ds_off, ds_on = DanceDataset(mk(True)), DanceDataset(mk(False))
        b_off = collate([ds_off[i] for i in range(2)])
        b_on = collate([ds_on[i] for i in range(2)])
        assert "BP_all" not in b_on and "KP_all" in b_on
        mesh = make_mesh(1)
        d_off = prepare_batch(b_off, mk(True), mesh)
        d_on = prepare_batch(b_on, mk(False), mesh)
        np.testing.assert_allclose(np.asarray(d_on["BP_all"]),
                                   np.asarray(d_off["BP_all"]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(d_on["ref_skeleton"]),
                                   np.asarray(d_off["ref_skeleton"]),
                                   atol=2e-6)
