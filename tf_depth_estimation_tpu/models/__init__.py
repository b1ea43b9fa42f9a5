"""Flax model families rebuilding the reference's four net files from shared modules.

Reference nets (SURVEY §2.1):
  - ``nets.py``                    disp_net (3-ch linear heads) + pose_exp_net
  - ``nets_depth.py``              disp_net (1-ch sigmoid + parallel flow decoder)
  - ``nets_optflow_depth.py``      disp_net (1-ch sigmoid, scaling 4) + depth_net (joint
                                   depth+pose+exp, decoder truncated at scale 3) + upconv net
  - ``nets_optflow_depth_pairtest.py``  full-resolution depth_net; bn-free disp_net

Here each family is ONE parameterized module.
"""

from tf_depth_estimation_tpu.models.dispnet import DispNet, DispNetVariant
from tf_depth_estimation_tpu.models.depth_pose import DepthPoseNet, PoseExpNet
from tf_depth_estimation_tpu.models.upconv import UpconvNet
from tf_depth_estimation_tpu.models.composite import LRNet
from tf_depth_estimation_tpu.models.turbo import TurboDepthNet, TurboVariant

__all__ = ["DispNet", "DispNetVariant", "DepthPoseNet", "PoseExpNet", "UpconvNet",
           "LRNet", "TurboDepthNet", "TurboVariant"]
