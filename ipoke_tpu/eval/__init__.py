from .backbone import backbone_activations, init_fvd_backbone
from .i3d import I3D, i3d_activations, init_i3d_params, load_torch_i3d_npz
from .metrics import (
    compute_fvd,
    diversity_score_mse,
    diversity_score_vgg,
    endpoint_error,
    angular_error,
    frechet_distance,
    optical_flow_metrics,
    perceptual_distance,
    psnr,
    ssim,
)
