"""Raise the stack rlimit for deep XLA:CPU compiles.

The exact-statistic integer programs compile into deep LLVM call/recursion
chains on XLA:CPU; under the default 8 MB stack the compiler overflows the
main thread's stack and the process dies with SIGSEGV (observed in a
full-suite run, round 3: faulthandler placed the crash inside
``backend_compile_and_load`` on the main thread, and the same program
compiles cleanly under ``ulimit -s unlimited``). On Linux the main thread's
stack mapping grows on demand up to RLIMIT_STACK, so raising the soft limit
at runtime — before the offending compile — is sufficient; threads spawned
afterwards also inherit the raised default.

TPU runs are unaffected (Mosaic/XLA:TPU compilation happens in the runtime
service), but the driver's CPU-mesh ``dryrun_multichip`` and the test suite
compile these programs host-side.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def raise_stack_limit() -> bool:
    """Best-effort raise of the RLIMIT_STACK soft limit to the hard limit.

    Returns True if the soft limit is now above the 8 MB default."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        if soft != hard:
            resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
            logger.debug("stack rlimit raised: %s -> %s", soft, hard)
        soft, _ = resource.getrlimit(resource.RLIMIT_STACK)
        return soft == resource.RLIM_INFINITY or soft > 8 * 1024 * 1024
    except Exception as e:  # pragma: no cover - platform-defensive
        logger.warning("could not raise stack rlimit: %s", e)
        return False
