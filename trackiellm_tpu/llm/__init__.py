"""LLM serving layer: tokenizer, sampling, grammar constraints, runner.

Parity target: the reference's LLM runner stack (src/ai_models/
tk_model_runner.h:38-225, tk_runner_lifecycle.c, tk_runner_streaming.c,
grammars/tool_call.gbnf) and the Rust ToolManager
(src/ai_models/src/tool_manager.rs).
"""

from trackiellm_tpu.llm.runner import LLMRunner, GenerationConfig  # noqa: F401
from trackiellm_tpu.llm.tokenizer import ByteTokenizer  # noqa: F401
from trackiellm_tpu.llm.grammar import ToolCallGrammar  # noqa: F401
