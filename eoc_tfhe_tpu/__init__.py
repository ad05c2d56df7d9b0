"""eoc_tfhe_tpu — a TPU-native TFHE framework.

A from-scratch JAX/XLA re-design of the capabilities of
``EntityOfCode/eoc-tfhe`` (the classic TFHE gate-bootstrapping stack behind a
string-based wrapper API): torus LWE/TLWE/TGSW, exact MXU-matmul negacyclic
polynomial products, blind rotation, key switching, the full boolean gate
API, integer/ASCII homomorphic layers, a tfhe_io-compatible codec, and
batch-sharded multi-device bootstrapping.

Layers (bottom-up, mirroring SURVEY.md §1):
  core.params / core.numeric  — parameter sets, exact Torus32 arithmetic
  core.lwe / tlwe / tgsw      — batched ciphertext algebra
  ops.polymul / rotate / keyswitch — the MXU compute kernels
  core.keys / bootstrap / gates    — keygen, gate bootstrapping, boolean API
  circuits                     — gate-level integer circuits (add/sub/mul/compare/select)
  io.tfhe_io                   — reference-compatible serialization
  api.tfhe                     — the ``Tfhe.*`` wrapper surface (base64 strings)
  parallel                     — mesh/sharding (dp batch, tp keyswitch rows)
  process                      — deterministic message-replay runtime (AO analog)
  serving                      — batching gate server (production serving tier)
  config                       — one typed FrameworkConfig for everything
"""

from .core.params import (GateBootstrappingParams, LweParams, TLweParams,
                          TGswParams, KeySwitchParams,
                          default_128bit_params, default_80bit_params,
                          default_gate_bootstrapping_params, test_params)
from .core.lwe import (LweCiphertext, LweKey, SeededLweCiphertext,
                       lwe_seeded_expand)
from .core.tlwe import TLweCiphertext, TLweKey
from .core.tgsw import TGswCiphertext
from .core.keys import (BootstrappingKey, CloudKeySet, KeySwitchKey, SecretKeySet,
                        new_random_gate_bootstrapping_secret_keyset)
from .core.bootstrap import EvalKey, bootstrap, bootstrap_woKS, prepare_eval_key
from .core import gates
from .core.bootstrap import prepare_eval_key_ntt, prepare_eval_key_fused
from .api.tfhe import Tfhe, TfheSession
from .config import FrameworkConfig, DEFAULT_CONFIG
from .serving import GateServer
from .io.virtualfs import VirtualFS, LocalBackend, Admissibility, InProcessGateway
from .models.ao_llama import LlamaBackend
from .process import Process, Router

__version__ = "0.1.0"
