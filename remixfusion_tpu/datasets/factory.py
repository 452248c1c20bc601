"""Dataset factory: config['dataset'] string -> loader instance.

Parity with the reference factory (datasets/dataset.py:12-53); real-sensor
loaders live in remixfusion_tpu.datasets.loaders and are imported lazily so
the synthetic path has no image-IO dependencies.
"""

from __future__ import annotations


def get_dataset(config):
    # normalize the reference's mixed-case names ('Fast_syn', 'BS3D',
    # 'Largeindoor' — /root/reference/datasets/dataset.py:12-47)
    name = config["dataset"].lower().replace("_", "")
    if name == "synthetic":
        from remixfusion_tpu.datasets.synthetic import SyntheticDataset
        return SyntheticDataset(config)
    if name == "syntheticlarge":
        from remixfusion_tpu.datasets.synthetic import SyntheticLargeDataset
        return SyntheticLargeDataset(config)

    from remixfusion_tpu.datasets import loaders

    table = {
        "replica": loaders.ReplicaDataset,
        "bs3d": loaders.BS3DDataset,
        "scannet": loaders.ScannetDataset,
        "tum": loaders.TUMDataset,
        "fastsyn": loaders.FastsynDataset,
        "uhumans": loaders.UhumansDataset,
        "azure": loaders.AzureDataset,
        "iphone": loaders.IPhoneDataset,
        "rgb": loaders.RGBDataset,
        "realsense": loaders.RealsenseDataset,
        "largeindoor": loaders.LargeindoorDataset,
    }
    if name not in table:
        raise ValueError(f"unknown dataset type {config['dataset']}")
    return table[name](config)
