from .fused_step import (build_fused_core, build_fused_policy_rollout,
                         build_fused_rollout)
