"""Human3.6M camera model tests (reference util/camera.py +
util/human36m.py:217-238): quaternion round-trips, world↔camera inverses,
projection sanity, and the normalized camera table layout."""

import numpy as np

from gfla_tpu.data.camera import (
    H36M_EXTRINSICS,
    H36M_INTRINSICS,
    camera_to_world,
    image_coordinates,
    init_cameras_param,
    normalize_screen_coordinates,
    project_to_2d,
    project_to_2d_linear,
    qinverse,
    qrot,
    world_to_camera,
)


def _unit_q(rng, shape=()):
    q = rng.standard_normal(shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternions:
    def test_qrot_preserves_norm(self):
        rng = np.random.default_rng(0)
        q = _unit_q(rng, (5,))
        v = rng.standard_normal((5, 3))
        out = qrot(q, v)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1),
            rtol=1e-12,
        )

    def test_qinverse_round_trip(self):
        rng = np.random.default_rng(1)
        q = _unit_q(rng, (7,))
        v = rng.standard_normal((7, 3))
        np.testing.assert_allclose(qrot(q, qrot(qinverse(q), v)), v,
                                   atol=1e-12)


class TestWorldCamera:
    def test_round_trip(self):
        rng = np.random.default_rng(2)
        cams = init_cameras_param()
        cam = cams["S1"][0]
        x_world = rng.standard_normal((4, 17, 3)) * 2.0
        x_cam = world_to_camera(x_world, cam["orientation"],
                                cam["translation"])
        back = camera_to_world(x_cam, cam["orientation"], cam["translation"])
        # the published quaternions are float32 and not exactly unit-norm
        np.testing.assert_allclose(back, x_world, atol=1e-5)

    def test_screen_round_trip(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1000, (10, 2))
        n = normalize_screen_coordinates(x, 1000, 1002)
        np.testing.assert_allclose(image_coordinates(n, 1000, 1002), x,
                                   atol=1e-9)
        assert np.all(np.abs(n[:, 0]) <= 1.0)


class TestProjection:
    def test_zero_distortion_matches_linear(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((2, 17, 3))
        x[..., 2] = np.abs(x[..., 2]) + 3.0  # in front of the camera
        params = np.zeros((2, 9))
        params[:, :2] = [2.29, 2.28]
        params[:, 2:4] = [0.02, 0.01]
        np.testing.assert_allclose(
            project_to_2d(x, params), project_to_2d_linear(x, params),
            atol=1e-12,
        )

    def test_h36m_projection_lands_on_screen(self):
        """A point near the subject's pelvis projects inside the frame for
        every calibrated camera."""
        cams = init_cameras_param()
        for subject in ("S1", "S9"):
            for cam in cams[subject]:
                x_world = np.array([[[0.0, 0.0, 1.0]]])  # ~pelvis height, m
                x_cam = world_to_camera(x_world, cam["orientation"],
                                        cam["translation"])
                assert x_cam[0, 0, 2] > 0  # in front of the camera
                pix = image_coordinates(
                    project_to_2d(x_cam, cam["intrinsic"][None]).reshape(1, 2),
                    cam["res_w"], cam["res_h"],
                )
                assert 0 <= pix[0, 0] <= cam["res_w"]
                assert 0 <= pix[0, 1] <= cam["res_h"]


class TestCameraTables:
    def test_layout(self):
        cams = init_cameras_param()
        assert set(cams) == {"S1", "S2", "S3", "S4", "S5", "S6", "S7", "S8",
                             "S9", "S11"}
        for s in ("S1", "S5", "S11"):
            assert len(cams[s]) == 4
            for cam in cams[s]:
                assert cam["intrinsic"].shape == (9,)
                # focal normalized to ~2.29, translation in meters
                assert 2.0 < cam["intrinsic"][0] < 2.5
                assert np.linalg.norm(cam["translation"]) < 10.0
        for s in ("S2", "S3", "S4"):  # intrinsics only (no extrinsics)
            assert "translation" not in cams[s][0]
            assert cams[s][0]["intrinsic"].shape == (9,)
        assert len(H36M_INTRINSICS) == 4
        assert len(H36M_EXTRINSICS) == 10
