"""cice5_tpu: a TPU-native sea-ice modeling framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the Los Alamos
CICE 5.1.2 sea-ice model (COSIMA fork; reference tree at /root/reference):
EVP/EAP dynamics, incremental-remapping transport, multi-category ITD with
mechanical ridging, BL99/mushy/zero-layer vertical thermodynamics,
CCSM3/delta-Eddington shortwave, melt-pond/age/level-ice tracers, forcing,
history and restart I/O — architected for TPUs: pure-functional state pytree,
one jitted step, vmapped column physics, shard_map spatial decomposition with
ppermute halos, Pallas EVP subcycling kernel.
"""
from cice5_tpu.config import (ModelConfig, GridConfig, ThermoConfig, DynConfig,
                              ShortwaveConfig, TracerConfig, ForcingConfig,
                              TimeConfig, column_config, gx3_config,
                              rect_config, tp1_config)
from cice5_tpu.state import State, TracerRegistry, build_tracer_registry, zeros_state
from cice5_tpu.grid import Grid, make_grid

__version__ = "0.1.0"
