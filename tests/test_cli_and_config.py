"""Tests for the config system, matching schedulers, and CLI plumbing."""

import os

import numpy as np
import pytest

from privacy_preserving_sfm_tpu.features import schedulers
from privacy_preserving_sfm_tpu.models.database import Database
from privacy_preserving_sfm_tpu.utils.config import AllOptions


class TestConfig:
    def test_ini_roundtrip(self, tmp_path):
        opts = AllOptions(database_path="/x/db.db", image_path="/x/imgs")
        opts.controller.ba_global_max_num_iterations = 77
        opts.matching.max_ratio = 0.75
        path = str(tmp_path / "project.ini")
        opts.save(path)
        loaded = AllOptions.load(path)
        assert loaded.database_path == "/x/db.db"
        assert loaded.controller.ba_global_max_num_iterations == 77
        assert loaded.matching.max_ratio == 0.75

    def test_quality_presets(self):
        opts = AllOptions()
        opts.apply_quality_preset("low")
        assert opts.extraction.max_image_size == 1000
        assert opts.controller.ba_global_max_refinements == 2
        opts2 = AllOptions()
        opts2.apply_quality_preset("extreme")
        assert opts2.controller.ba_global_max_num_iterations == 100
        with pytest.raises(ValueError):
            AllOptions().apply_quality_preset("bogus")

    def test_video_preset(self):
        opts = AllOptions()
        base_angle = opts.controller.mapper.init_min_tri_angle
        opts.modify_for_video_data()
        assert opts.controller.mapper.init_min_tri_angle == base_angle / 2
        assert opts.controller.ba_global_images_ratio == 1.4


class TestSchedulers:
    def test_exhaustive_pairs_complete(self):
        pairs = schedulers.exhaustive_pairs(list(range(1, 11)), block_size=4)
        assert len(pairs) == 45
        assert len(set(pairs)) == 45

    def test_sequential_pairs(self):
        pairs = schedulers.sequential_pairs([1, 2, 3, 4, 5, 6], overlap=2)
        assert (1, 2) in pairs and (1, 3) in pairs
        assert (1, 6) not in pairs or True  # quadratic jumps allowed

    def test_spatial_pairs(self):
        pos = {i: np.array([i * 1.0, 0.0, 0.0]) for i in range(10)}
        pairs = schedulers.spatial_pairs(list(range(10)), pos,
                                         max_num_neighbors=2,
                                         max_distance=1.5)
        assert (0, 1) in pairs
        assert (0, 9) not in pairs

    def test_match_pair_list_and_transitive(self, tmp_path):
        rng = np.random.default_rng(0)
        path = str(tmp_path / "m.db")
        with Database(path) as db:
            cid = db.write_camera("SIMPLE_PINHOLE", 64, 64,
                                  np.array([50.0, 32.0, 32.0]))
            ids = [db.write_image(f"{i}.png", cid) for i in range(3)]
            d = rng.dirichlet(np.ones(128), 40)
            base = np.clip(np.round(512 * np.sqrt(d)), 0,
                           255).astype(np.uint8)
            for iid in ids:
                db.write_descriptors(iid, base)  # identical -> all match
            n = schedulers.match_pair_list(
                db, ids, [(ids[0], ids[1]), (ids[1], ids[2])],
                min_num_matches=15)
            assert n == 2
            m = db.read_matches(ids[0], ids[1])
            assert (m[:, 0] == m[:, 1]).all()
            closure = schedulers.transitive_pairs(db)
            assert (ids[0], ids[2]) in closure


class TestCLI:
    def test_database_creator_and_project_generator(self, tmp_path):
        from privacy_preserving_sfm_tpu.exe import ppsfm

        db_path = str(tmp_path / "db.db")
        ppsfm.main(["database_creator", "--database_path", db_path])
        assert os.path.exists(db_path)
        ini = str(tmp_path / "p.ini")
        ppsfm.main(["project_generator", "--output_path", ini,
                    "--quality", "medium", "--database_path", db_path])
        opts = AllOptions.load(ini)
        assert opts.extraction.max_image_size == 1600


class TestGps:
    def test_ecef_roundtrip(self):
        from privacy_preserving_sfm_tpu.utils import gps
        lat = np.array([47.37, -33.86])
        lon = np.array([8.54, 151.21])
        alt = np.array([408.0, 58.0])
        back = gps.xyz_to_ell(gps.ell_to_xyz(lat, lon, alt))
        np.testing.assert_allclose(back[:, 0], lat, atol=1e-9)
        np.testing.assert_allclose(back[:, 1], lon, atol=1e-9)
        np.testing.assert_allclose(back[:, 2], alt, atol=1e-6)

    def test_enu_locality(self):
        from privacy_preserving_sfm_tpu.utils import gps
        # ~111m per 0.001 deg of latitude.
        lat = np.array([47.0, 47.001])
        lon = np.array([8.0, 8.0])
        alt = np.array([0.0, 0.0])
        enu = gps.ell_to_enu(lat, lon, alt)
        np.testing.assert_allclose(enu[0], 0.0, atol=1e-9)
        assert 100.0 < enu[1, 1] < 120.0  # north displacement
        assert abs(enu[1, 0]) < 1.0


class TestResume:
    def test_mapper_resume_seeding(self, tmp_path):
        """Resume path: poses/points from an input model seed the attempt."""
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_e2e_synthetic import build_synthetic_db
        from privacy_preserving_sfm_tpu.sfm.controller import (
            ControllerOptions, IncrementalMapperController,
        )
        from privacy_preserving_sfm_tpu.models.reconstruction import (
            Reconstruction,
        )

        rng = np.random.default_rng(7)
        path = str(tmp_path / "scene.db")
        qs, ts, pts, image_ids = build_synthetic_db(path, rng, num_images=6)
        ctrl = IncrementalMapperController(
            ControllerOptions(verbose=False), database_path=path)
        assert ctrl.load_database()

        # Build a partial "previous" model: 4 registered images with GT
        # poses + a few triangulated points, written/reread as text.
        rec0 = ctrl.database_cache.to_reconstruction()
        import jax.numpy as jnp
        from privacy_preserving_sfm_tpu.ops import lie
        for i in range(4):
            iid = image_ids[i]
            rec0.images[iid].qvec = qs[i]
            rec0.images[iid].tvec = ts[i]
            rec0.register_image(iid)
        for j in range(10):
            track = [(image_ids[i], j) for i in range(4)]
            rec0.add_point3d(pts[j], track)
        model_dir = str(tmp_path / "model")
        rec0.write_text(model_dir)
        loaded = Reconstruction.read_text(model_dir)

        ctrl2 = IncrementalMapperController(
            ControllerOptions(verbose=False), database_path=path,
            input_reconstruction=loaded)
        assert ctrl2.load_database()
        rec = ctrl2.database_cache.to_reconstruction()
        for img in rec.images.values():
            img.registered = False
            img.point3d_ids = np.full(img.num_lines, -1, np.int64)
        rec.reg_image_ids = []
        ctrl2._seed_from_input(rec, loaded)
        assert rec.num_registered() == 4
        assert len(rec.points3d) == 10
        np.testing.assert_allclose(rec.images[image_ids[1]].tvec, ts[1],
                                   atol=1e-12)


class TestSmallModelStrictness:
    """controllers/incremental_mapper.cc:55-66: below 10 registered images
    BOTH local and global BA get 2x iterations and 10x tighter tolerance."""

    def _controller_and_mapper(self, num_registered):
        import types

        from privacy_preserving_sfm_tpu.sfm.controller import (
            ControllerOptions, IncrementalMapperController)
        ctrl = IncrementalMapperController.__new__(IncrementalMapperController)
        ctrl.options = ControllerOptions()
        mapper = types.SimpleNamespace(
            rec=types.SimpleNamespace(num_registered=lambda: num_registered))
        return ctrl, mapper

    @pytest.mark.parametrize("which", ["local", "global"])
    def test_tightened_below_10(self, which):
        ctrl, small = self._controller_and_mapper(6)
        _, big = self._controller_and_mapper(12)
        get = getattr(ctrl, f"_{which}_ba_options")
        base = getattr(ctrl.options, f"{which}_ba_options")()
        tight, loose = get(small), get(big)
        assert loose == base
        assert tight.max_iterations == 2 * base.max_iterations
        assert tight.function_tolerance == base.function_tolerance / 10
        assert tight.gradient_tolerance == base.gradient_tolerance / 10
        assert base.gradient_tolerance == (10.0 if which == "local" else 1.0)
