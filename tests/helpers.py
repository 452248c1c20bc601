"""Shared test fixtures: a tiny full-schema config + synthetic scene."""

import numpy as np


def tiny_config(**overrides):
    """Full config-schema dict with miniature sizes for CPU tests."""
    cfg = {
        "dataset": "synthetic",
        "print_ape": 0,
        "data": {
            "downsample": 1, "sc_factor": 1, "translation": 0,
            "num_workers": 0, "exp_name": "test", "output": "/tmp/rmx_test",
            "datadir": "/tmp/none", "trainskip": 1,
            "synthetic": {
                "n_frames": 12, "room_size": 4.0, "sphere_radius": 0.6,
                "orbit_radius": 1.2, "orbit_degrees": 40.0,
            },
        },
        "globalV": {
            "use": 1, "base_resolution": 48, "n_levels": 1,
            "per_level_scale": 1, "n_features_per_level": 4,
        },
        "mapping": {
            "sample": 128, "first_mesh": False, "iters": 2, "BA_iters": 2,
            "lr_embed": 0.01, "lr_embed_res": 0.01, "lr_decoder": 0.01,
            "lr_rot": 5e-4, "lr_trans": 5e-4, "lr_pose": 5e-4,
            "keyframe_every": 2, "map_every": 2, "n_pixels": 0.05,
            "first_iters": 10, "optim_cur": False, "min_pixels_cur": 20,
            "map_accum_step": 1, "pose_accum_step": 1, "map_wait_step": 0,
            "filter_depth": False, "opt_pose": True, "clamp": 2.0,
            "pose_scale": 1.0, "save_ckpt": False,
            "bound": [[0.0, 4.0], [0.0, 4.0], [0.0, 4.0]],
            "marching_cubes_bound": [[0.0, 4.0], [0.0, 4.0], [0.0, 4.0]],
        },
        "tracking": {"ignore_edge_W": 2, "ignore_edge_H": 2,
                     "const_speed": True},
        "RO": {
            "init_size": 0.02, "scaling_coefficient": 0.09,
            "particle_iter_lens": 4, "PST_path": "",
            "PST_size": [256, 128, 64], "count_search": 50,
            "fix_level_index": 0, "filter_weight": 2, "rgb_rose": 0,
            "rgb_rose_weight": 0.1, "save_volume": 0, "save_freq": 1000,
            "cut": 0, "cut_dist": 8.0, "sample_range": 0.0,
            "iterative_scale": False,
        },
        "grid": {"enc": "HashGrid", "tcnn_encoding": True, "hash_size": 12,
                 "voxel_color": 0.08, "voxel_sdf": 0.08},
        "pos": {"enc": "OneBlob", "n_bins": 8},
        "decoder": {"geo_feat_dim": 15, "hidden_dim": 32, "num_layers": 2,
                    "num_layers_color": 2, "hidden_dim_color": 32,
                    "tcnn_network": False},
        "cam": {
            "H": 48, "W": 64, "fx": 40.0, "fy": 40.0, "cx": 31.5, "cy": 23.5,
            "png_depth_scale": 1000.0, "crop_edge": 0, "near": 0.0,
            "far": 5.0, "depth_trunc": 100.0,
        },
        "training": {
            "rgb_weight": 5.0, "depth_weight": 0.1, "sdf_weight": 1000,
            "fs_weight": 10, "surface_weight": 0, "eikonal_weight": 0,
            "smooth_weight": 0.001, "smooth_pts": 8, "smooth_vox": 0.1,
            "smooth_margin": 0.05, "n_samples_d": 5, "range_d": 0.25,
            "n_range_d": 12, "n_importance": 0, "perturb": 1,
            "white_bkgd": False, "c_trunc": 0.25, "trunc": 0.06,
            "rot_rep": "quat", "rgb_missing": 0.0,
        },
        "mesh": {"resolution": 64, "vis": 500, "voxel_eval": 0.1,
                 "voxel_final": 0.1, "visualisation": False,
                 "mesh_bound_scale": 1.02, "only_final": 1, "render_img": 0},
        "volume": {
            "voxel_size": 0.05, "version": "center", "trunc": 0.06,
            "weight_threshold": 2.0, "weight_clamp": 1.0, "t_treshold": 1,
            "x_config": {"fix": 0, "len": 2, "range": [0, 1]},
            "y_config": {"fix": 0, "len": 2, "range": [0, 1]},
            "z_config": {"fix": 0, "len": 2, "range": [0, 1]},
            "first_len": 2, "second_len": 2, "third_len": 2,
            "more_angel_t": 20,
        },
        "video": {"save": False, "save_freq": 20},
    }

    def merge(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                merge(dst[k], v)
            else:
                dst[k] = v

    merge(cfg, overrides)
    return cfg
