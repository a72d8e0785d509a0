"""neo_mpc_planner2_tpu — a TPU-native MPC engine for omnidirectional robots.

Brand-new JAX/XLA/Pallas re-design of the capabilities of
neobotix/neo_mpc_planner2 (ROS 2 Nav2 pure-pursuit plugin + scipy-SLSQP
optimization server): one pure, batched, differentiable controller step,
vmap-able over thousands of scenarios and pjit-shardable over a TPU mesh.
See SURVEY.md for the layer map and reference citations.
"""

import os as _os

if _os.environ.get("NEO_MPC_COMPILE_CACHE"):
    # Opt-in persistent XLA compilation cache. First compiles of the jitted
    # engine take tens of seconds on remote/tunneled TPU backends; a disk
    # cache makes every later process start warm. Env-driven so library
    # import stays side-effect-free by default.
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["NEO_MPC_COMPILE_CACHE"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import (CompatConfig, MpcConfig, config_from_ros_params,
                     default_config, fleet_config, product_config)
from .controller import ControllerException, NeoMpcController
from .engine import ControlState, MpcEngine, StepResult, controller_step, init_state, solve_step
from .ops.costmap import Costmap, cost_at_world, cost_at_world_bilinear
from .ops.footprint import Footprint, footprint_cost, footprint_cost_at_pose, transform_footprint
from .ops.objective import Scenario, Weights, make_objective, objective_parity, objective_product
from .ops.pursuit import Plan, PursuitResult, pursuit_tick
from .ops.rollout import rollout
from .solver import SolveResult, make_solver, project_feasible, prox_fista
from .sqp import make_sqp_solver, sqp_solve

__version__ = "0.1.0"

__all__ = [
    "CompatConfig", "MpcConfig", "config_from_ros_params", "default_config",
    "fleet_config", "product_config",
    "ControllerException", "NeoMpcController",
    "ControlState", "MpcEngine", "StepResult", "controller_step", "init_state", "solve_step",
    "Costmap", "cost_at_world", "cost_at_world_bilinear",
    "Footprint", "footprint_cost", "footprint_cost_at_pose", "transform_footprint",
    "Scenario", "Weights", "make_objective", "objective_parity", "objective_product",
    "Plan", "PursuitResult", "pursuit_tick",
    "rollout",
    "SolveResult", "make_solver", "project_feasible", "prox_fista",
    "make_sqp_solver", "sqp_solve",
]
