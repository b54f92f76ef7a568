"""Reference CLI-surface parity: the documented command lines parse
verbatim, with the reference's flag semantics.

Sources: reference README.md:155-164 (demo), PERSON_IMAGE_GENERATION.md:
41-62 (test fashion/market), model/pose_model.py:39-44 (--use_spect_d
store_false), data/base_dataset.py:21-23 + data/market_dataset.py:17-19
(--angle/--shift/--scale), data/animation_dataset.py:31 (--debug),
data/keypointtest_dataset.py:26 (--eval_set), options/base_options.py:42-46
(visdom --display_* flags, accepted and ignored here).
"""

import sys

import pytest


def _parse(monkeypatch, argv, train=False, save=False):
    from gfla_tpu.options import TestOptions, TrainOptions

    monkeypatch.setattr(sys, "argv", argv)
    cls = TrainOptions if train else TestOptions
    return cls().parse(save=save)


class TestDocumentedCommandLines:
    def test_readme_demo_fashion_verbatim(self, monkeypatch):
        """README.md:155-164 — note --gpu_id (not --gpu_ids)."""
        argv = [
            "demo.py",
            "--name=pose_fashion_checkpoints",
            "--model=pose",
            "--attn_layer=2,3",
            "--kernel_size=2=5,3=3",
            "--gpu_id=0",
            "--dataset_mode=fashion",
            "--dataroot=./dataset/fashion",
            "--results_dir=./demo_results/fashion",
        ]
        opt = _parse(monkeypatch, argv)
        assert opt.attn_layer == [2, 3]
        assert opt.kernel_size == {"2": 5, "3": 3}
        assert opt.gpu_ids == "0"

    def test_person_image_generation_test_market_verbatim(self, monkeypatch):
        """PERSON_IMAGE_GENERATION.md:52-61."""
        argv = [
            "test.py",
            "--name=pose_market_checkpoints",
            "--model=pose",
            "--attn_layer=2",
            "--kernel_size=2=3",
            "--gpu_id=0",
            "--dataset_mode=market",
            "--dataroot=./dataset/market",
            "--results_dir=./eval_results/market",
        ]
        opt = _parse(monkeypatch, argv)
        assert opt.attn_layer == [2]
        assert opt.kernel_size == {"2": 3}
        assert opt.old_size == (128, 64)        # market defaults
        # test phase: no augmentation ranges installed
        assert not opt.angle and not opt.shift and not opt.scale


class TestSpectralNormFlags:
    def test_use_spect_d_store_false_semantics(self, monkeypatch):
        """Reference --use_spect_d is store_false w/ default True
        (pose_model.py:40,44): passing it DISABLES spectral norm."""
        from gfla_tpu.options.options import resolve_use_spect_d

        base = ["train.py", "--model=pose", "--dataset_mode=synthetic",
                "--dataroot=/tmp/none"]
        opt = _parse(monkeypatch, base, train=True)
        assert opt.use_spect_d is True
        assert resolve_use_spect_d(opt) is True

        opt = _parse(monkeypatch, base + ["--use_spect_d"], train=True)
        assert opt.use_spect_d is False
        assert resolve_use_spect_d(opt) is False

    def test_no_spect_d_alias(self, monkeypatch):
        from gfla_tpu.options.options import resolve_use_spect_d

        argv = ["train.py", "--model=pose", "--dataset_mode=synthetic",
                "--dataroot=/tmp/none", "--no_spect_d"]
        opt = _parse(monkeypatch, argv, train=True)
        assert resolve_use_spect_d(opt) is False

    def test_resolve_from_legacy_namespace(self):
        """Programmatic namespaces that only carry no_spect_d still work."""
        import argparse

        from gfla_tpu.options.options import resolve_use_spect_d

        assert resolve_use_spect_d(argparse.Namespace(no_spect_d=False))
        assert not resolve_use_spect_d(argparse.Namespace(no_spect_d=True))


class TestAffineRangeFlags:
    def test_market_train_defaults_install_ranges(self, monkeypatch):
        """market train: angle/shift/scale default (-5,5)/(-5,5)/(0.95,1.05)
        (data/market_dataset.py:17-19)."""
        argv = ["train.py", "--model=pose", "--dataset_mode=market",
                "--dataroot=/tmp/none"]
        opt = _parse(monkeypatch, argv, train=True)
        assert opt.angle == (-5, 5)
        assert opt.shift == (-5, 5)
        assert opt.scale == (0.95, 1.05)

    def test_cli_tuple_overrides_default(self, monkeypatch):
        argv = ["train.py", "--model=pose", "--dataset_mode=market",
                "--dataroot=/tmp/none", "--angle=-10,10", "--scale=0.9,1.1"]
        opt = _parse(monkeypatch, argv, train=True)
        assert opt.angle == (-10, 10)
        assert opt.scale == (0.9, 1.1)
        assert opt.shift == (-5, 5)             # untouched default

    def test_cli_false_disables(self, monkeypatch):
        """--angle=False must NOT be re-defaulted by the dataset."""
        argv = ["train.py", "--model=pose", "--dataset_mode=market",
                "--dataroot=/tmp/none", "--angle=False"]
        opt = _parse(monkeypatch, argv, train=True)
        assert opt.angle is False
        assert opt.shift == (-5, 5)

    def test_single_magnitude_expands(self, monkeypatch):
        argv = ["train.py", "--model=pose", "--dataset_mode=fashion",
                "--dataroot=/tmp/none", "--angle=7"]
        opt = _parse(monkeypatch, argv, train=True)
        assert opt.angle == (-7.0, 7.0)


class TestCompatFlags:
    def test_debug_eval_set_display_flags_accepted(self, monkeypatch,
                                                   capsys):
        argv = [
            "train.py", "--model=pose", "--dataset_mode=synthetic",
            "--dataroot=/tmp/none", "--debug", "--eval_set=test",
            "--display_port=8097", "--display_env=main",
            "--display_single_pane_ncols=4",
        ]
        opt = _parse(monkeypatch, argv, train=True)
        assert opt.debug is True
        assert opt.eval_set == "test"
        out = capsys.readouterr().out
        assert "visdom" in out  # accept-and-warn

    def test_dataset_consumes_cli_ranges(self, tmp_path):
        """PairedKeypointDataset honors CLI-style angle/shift/scale."""
        import argparse

        from gfla_tpu.data.paired_dataset import PairedKeypointDataset

        bones = tmp_path / "anno.csv"
        bones.write_text(
            "name:keypoints_y:keypoints_x\n"
            "a.jpg:[1, 2]:[3, 4]\n"
        )

        class _Stub(PairedKeypointDataset):
            def get_paths(self, opt):
                return str(tmp_path), str(bones), []

        opt = argparse.Namespace(
            phase="train", load_size=(64, 48), old_size=(64, 48),
            angle=(-5, 5), shift=(-5, 5), scale=(0.95, 1.05),
            structure_nc=18, image_nc=3, seed=7, dataroot=str(tmp_path),
            max_dataset_size=4, isTrain=True,
        )
        ds = _Stub(opt)
        assert ds.angle == (-5, 5) and ds.scale == (0.95, 1.05)

        opt.angle = False   # explicit off
        ds = _Stub(opt)
        assert ds.angle is None


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
