from .networks import ActorCritic, gaussian_entropy, gaussian_log_prob, obs_scales
from .ppo import PPOConfig, PPOLearner, TrainState, Transition
