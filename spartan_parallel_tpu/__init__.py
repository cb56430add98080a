"""spartan_parallel_tpu — a TPU-native data-parallel Spartan zkSNARK.

Re-implements the full public surface of the reference `libspartan` fork
(scroll-tech/spartan-parallel, src/lib.rs): SNARK/SNARKGens with the
9-stage data-parallel pipeline, NIZK/NIZKGens, Instance + circuit
generators, Assignment types, and the CLI driver — built TPU-first on
JAX limb-tensor kernels (ops/), a native C host curve layer (native/),
and multi-chip mesh sharding (parallel/).
"""

import os as _os

# Persistent XLA compilation cache: the prover's kernels are few but their
# limb-arithmetic graphs are large, and a cold compile costs 10-45 s per
# kernel on a small host. Caching makes that a once-per-machine cost.
# Opt out with SPARTAN_NO_JAX_CACHE=1.


def _host_fingerprint() -> str:
    """Short digest of this host's CPU identity. XLA:CPU cache entries are
    compiled machine code tuned to the compile host's ISA features; a home
    directory shared across machines (observed in CI) otherwise serves
    entries whose features do not exist here — cpu_aot_loader then warns
    about possible SIGILL on every load. Keying the cache DIRECTORY on the
    CPU-feature set makes a foreign cache invisible instead of poisonous."""
    import hashlib as _hashlib

    ident = []
    try:
        with open("/proc/cpuinfo") as _f:
            for _line in _f:
                if _line.startswith(("flags", "model name")):
                    ident.append(_line.strip())
                    if len(ident) >= 2:
                        break
    except OSError:
        import platform as _platform

        ident.append(_platform.processor() or _platform.machine())
    return _hashlib.sha256("|".join(ident).encode()).hexdigest()[:12]


if not _os.environ.get("SPARTAN_NO_JAX_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "SPARTAN_JAX_CACHE_DIR",
        _os.path.expanduser(
            "~/.cache/spartan_parallel_tpu/jax-" + _host_fingerprint()))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from .core.consts import L
from .core.field import Scalar
from .models.instance import (
    Instance,
    gen_block_inst,
    gen_pairwise_check_inst,
    gen_perm_root_inst,
)
from .models.nizk import NIZK, NIZKGens
from .models.r1csproof import R1CSGens
from .models.snark import (
    SNARK,
    SNARKGens,
    ComputationCommitment,
    ComputationDecommitment,
)
from .models.snark_single import SpartanSNARK, SpartanSNARKGens
from .utils.errors import ProofVerifyError, R1CSError
from .utils.transcript import Transcript


class Assignment:
    """Assignment of field values to inputs/variables (lib.rs:89-151)."""

    __slots__ = ("assignment",)

    def __init__(self, assignment):
        """assignment: list of ints/Scalars (canonical field values)."""
        out = []
        for v in assignment:
            if isinstance(v, (bytes, bytearray)):
                x = int.from_bytes(v, "little")
                if x >= L:
                    raise R1CSError("invalid scalar encoding")
            else:
                x = int(v)
                if not 0 <= x < L:
                    raise R1CSError("scalar out of range")
            out.append(x)
        self.assignment = out

    def write(self, f):
        """Text dump, one row per value (lib.rs:123-142)."""
        for v in self.assignment:
            b = v.to_bytes(32, "little")
            size = 32
            while size > 0 and b[size - 1] == 0:
                size -= 1
            f.write(" ".join(str(x) for x in b[:size]) + " \n")


VarsAssignment = Assignment
InputsAssignment = Assignment
MemsAssignment = Assignment

__all__ = [
    "SNARK", "SNARKGens", "NIZK", "NIZKGens", "SpartanSNARK",
    "SpartanSNARKGens", "Instance", "R1CSGens",
    "Assignment", "VarsAssignment", "InputsAssignment", "MemsAssignment",
    "ComputationCommitment", "ComputationDecommitment", "Scalar",
    "Transcript", "ProofVerifyError", "R1CSError", "gen_block_inst",
    "gen_pairwise_check_inst", "gen_perm_root_inst", "L",
]
