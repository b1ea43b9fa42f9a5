"""Experiment entry points — CLI equivalents of the reference train_* scripts.

Run as ``python -m tf_depth_estimation_tpu.train.experiments.<name> --dataset_dir ...``:

- ``depth_only``       -> train_depth_only.py         (BASELINE config 2)
- ``depth_then_cam``   -> train_depth_then_cam.py     (BASELINE config 3)
- ``optflow_combine``  -> train_optflow_combine.py    (BASELINE config 4)
- ``on_demon``         -> train_depth_only_onDemon.py (BASELINE config 5)
- ``split_training``   -> split_training.py           (two-phase curriculum)
"""
