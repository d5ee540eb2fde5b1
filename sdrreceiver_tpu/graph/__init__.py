from . import compiler, config, plan
from .compiler import CompiledReceiver, compile_plan
from .config import ReceiverConfig, load_ini, parse_ini_text
from .plan import ReceiverPlan, build_plan

__all__ = [
    "compiler",
    "config",
    "plan",
    "CompiledReceiver",
    "compile_plan",
    "ReceiverConfig",
    "load_ini",
    "parse_ini_text",
    "ReceiverPlan",
    "build_plan",
]
