"""JSON-Schema-constrained tool-call grammar (llm/schema.py).

Parity: llama.cpp's json_schema_to_grammar layered over the reference's
GBNF tool-call contract (src/ai_models/grammars/tool_call.gbnf:1-23,
wired in src/ai_models/tk_runner_lifecycle.c:47-80) — arguments must
CONFORM to the tool's schema, not just parse as JSON.
"""

import json

import jax
import jax.numpy as jnp
import pytest

from trackiellm_tpu.llm.grammar import JsonAcceptor, ToolCallGrammar
from trackiellm_tpu.llm.runner import (GenerationConfig, LLMRunner,
                                       ToolDefinition)
from trackiellm_tpu.llm.schema import (SchemaAcceptor, _min_value_text,
                                       compile_schema)
from trackiellm_tpu.llm.tokenizer import ByteTokenizer
from trackiellm_tpu.models import llm as llm_model


def accepts(schema, text: str) -> bool:
    acc = SchemaAcceptor(schema)
    return acc.feed_text(text) and acc.at_end()


NAV = {
    "type": "object",
    "properties": {
        "direction": {"type": "string",
                      "enum": ["left", "right", "forward"]},
        "distance_m": {"type": "number"},
        "announce": {"type": "boolean"},
    },
    "required": ["direction", "distance_m"],
}


class TestCompile:
    def test_fallbacks(self):
        assert compile_schema(True) == ("any",)
        assert compile_schema({}) == ("any",)
        assert compile_schema({"anyOf": [{"type": "string"}]}) == ("any",)
        assert compile_schema({"type": ["string", "null"]}) == ("any",)

    def test_min_value_round_trips(self):
        for schema in (NAV, {"type": "array", "items": {"type": "integer"},
                             "minItems": 2},
                       {"type": "string"}, {"type": "boolean"},
                       {"enum": [12, "x"]}):
            node = compile_schema(schema)
            text = _min_value_text(node)
            json.loads(text)
            assert accepts(schema, text), text


class TestScalars:
    def test_integer(self):
        s = {"type": "integer"}
        assert accepts(s, "42")
        assert accepts(s, "-7")
        assert accepts(s, "0")
        assert not accepts(s, "1.5")
        assert not accepts(s, "1e3")
        assert not accepts(s, '"1"')

    def test_number(self):
        s = {"type": "number"}
        assert accepts(s, "1.5")
        assert accepts(s, "-2.5e-3")
        assert not accepts(s, "01")
        assert not accepts(s, "true")

    def test_string_and_escapes(self):
        s = {"type": "string"}
        assert accepts(s, '"hello"')
        assert accepts(s, '"a\\nb"')
        assert accepts(s, '"u\\u0041"')
        assert not accepts(s, '"a\\xb"')      # illegal escape
        assert not accepts(s, '"a\\u00g1"')   # non-hex in \\u
        assert not accepts(s, "42")

    def test_boolean_null_enum(self):
        assert accepts({"type": "boolean"}, "true")
        assert accepts({"type": "boolean"}, "false")
        assert not accepts({"type": "boolean"}, "null")
        assert accepts({"type": "null"}, "null")
        e = {"enum": ["red", "green"]}
        assert accepts(e, '"red"')
        assert not accepts(e, '"blue"')
        assert accepts({"enum": [1, 2.5]}, "2.5")
        assert accepts({"const": "stop"}, '"stop"')
        assert not accepts({"const": "stop"}, '"go"')


class TestObjects:
    def test_required_and_optional(self):
        assert accepts(NAV, '{"direction":"left","distance_m":2}')
        assert accepts(
            NAV, '{"direction":"left","distance_m":2,"announce":true}')
        # missing required distance_m
        assert not accepts(NAV, '{"direction":"left"}')
        # unknown key
        assert not accepts(NAV, '{"direction":"left","distance_m":2,"x":1}')
        # out of order (declaration order is enforced)
        assert not accepts(NAV, '{"distance_m":2,"direction":"left"}')
        # wrong value type for a property
        assert not accepts(NAV, '{"direction":"left","distance_m":"2"}')
        # enum violation inside the object
        assert not accepts(NAV, '{"direction":"up","distance_m":2}')

    def test_whitespace_tolerated(self):
        assert accepts(NAV,
                       ' {\n "direction" : "right" ,\t"distance_m": 1.5 } ')

    def test_empty_and_nested(self):
        s = {"type": "object", "properties": {
            "inner": {"type": "object",
                      "properties": {"n": {"type": "integer"}},
                      "required": ["n"]}},
            "required": ["inner"]}
        assert accepts(s, '{"inner":{"n":3}}')
        assert not accepts(s, '{"inner":{}}')
        assert not accepts(s, '{"inner":null}')

    def test_key_prefix_pruning(self):
        # "dist" shares a prefix with nothing after "direction" is
        # consumed; a bogus key failing mid-prefix must reject.
        acc = SchemaAcceptor(NAV)
        assert acc.feed_text('{"di')
        assert acc.feed("r")          # could still be "direction"
        assert not acc.copy().feed("x")  # "dirx..." matches nothing


class TestArrays:
    def test_typed_items_and_bounds(self):
        s = {"type": "array", "items": {"type": "integer"},
             "minItems": 1, "maxItems": 3}
        assert accepts(s, "[1]")
        assert accepts(s, "[1,2,3]")
        assert not accepts(s, "[]")           # below minItems
        assert not accepts(s, "[1,2,3,4]")    # above maxItems
        assert not accepts(s, '[1,"x"]')      # item type

    def test_array_of_enums(self):
        s = {"type": "array", "items": {"enum": ["a", "ab"]}}
        # NB "a"/"ab" renders prefix-free once quoted
        assert accepts(s, '["a","ab"]')
        assert not accepts(s, '["abc"]')


class TestAnyFallback:
    def test_unconstrained_value(self):
        s = {"type": "object",
             "properties": {"blob": {}},
             "required": ["blob"]}
        assert accepts(s, '{"blob":{"x":[1,{"y":null}]}}')
        assert accepts(s, '{"blob":"s"}')
        assert not accepts(s, '{"blob":}')


class TestClosure:
    PREFIXES = [
        "",
        "{",
        '{"direction"',
        '{"dir',
        '{"direction":',
        '{"direction":"le',
        '{"direction":"left"',
        '{"direction":"left",',
        '{"direction":"left","distance_m":1',
        '{"direction":"left","distance_m":1.',
        '{"direction":"left","distance_m":1,"announce":tr',
    ]

    @pytest.mark.parametrize("prefix", PREFIXES)
    def test_closure_completes_nav(self, prefix):
        acc = SchemaAcceptor(NAV)
        assert acc.feed_text(prefix), prefix
        closure = acc.closure()
        full = prefix + closure
        obj = json.loads(full)
        assert accepts(NAV, full)
        assert obj["direction"] in ("left", "right", "forward")
        assert isinstance(obj["distance_m"], (int, float))

    def test_closure_array_min_items(self):
        s = {"type": "array", "items": {"type": "integer"}, "minItems": 2}
        acc = SchemaAcceptor(s)
        assert acc.feed_text("[5")
        arr = json.loads("[5" + acc.closure())
        assert len(arr) >= 2

    def test_closure_string_escape(self):
        acc = SchemaAcceptor({"type": "string"})
        assert acc.feed_text('"a\\')
        json.loads('"a\\' + acc.closure())
        acc2 = SchemaAcceptor({"type": "string"})
        assert acc2.feed_text('"a\\u0')
        json.loads('"a\\u0' + acc2.closure())


class TestToolCallGrammarIntegration:
    def test_typed_grammar_accept_reject(self):
        g = ToolCallGrammar(["navigate", "stop"],
                            {"navigate": NAV})
        ok = ('{"tool_call":{"name":"navigate","arguments":'
              '{"direction":"left","distance_m":2}}}')
        assert g.feed_text(ok)
        assert g.done

        g.reset()
        bad = ('{"tool_call":{"name":"navigate","arguments":'
               '{"speed":1}}}')
        assert not g.feed_text(bad)

        # tools WITHOUT a schema keep the generic JSON acceptor
        g.reset()
        free = ('{"tool_call":{"name":"stop","arguments":'
                '{"anything":["goes",1]}}}')
        assert g.feed_text(free)
        assert g.done

    def test_closure_mid_args_is_schema_valid(self):
        g = ToolCallGrammar(["navigate"], {"navigate": NAV})
        assert g.feed_text('{"tool_call":{"name":"navigate","arguments":'
                           '{"direction":"forw')
        tail = g.closure()
        full = ('{"tool_call":{"name":"navigate","arguments":'
                '{"direction":"forw' + tail)
        obj = json.loads(full)
        args = obj["tool_call"]["arguments"]
        assert args["direction"] == "forward"
        assert "distance_m" in args

    def test_token_mask_caches_per_state(self):
        g = ToolCallGrammar(["navigate"], {"navigate": NAV})
        tok = ByteTokenizer(n_special_pad_to=260)
        m1 = g.token_mask(tok)
        # skeleton phase: exactly one char legal
        assert sum(m1) == 1
        g.feed_text('{"tool_call":{"name":"navigate","arguments":{')
        m2 = g.token_mask(tok)
        m3 = g.token_mask(tok)
        assert m2 is m3  # cached per state
        # only '"' (key start), whitespace — and NOT '}' (required
        # properties remain)
        assert m2[ord('"')]
        assert not m2[ord("}")]
        assert not m2[ord("x")]


class TestRunnerEndToEnd:
    def test_schema_forced_generation(self):
        cfg = llm_model.LLMConfig.tiny()._replace(vocab_size=260)
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        tool = ToolDefinition(
            "navigate", "move the user",
            {"direction": "where to go", "distance_m": "how far"},
            schema=NAV)
        r = LLMRunner(params, cfg, ByteTokenizer(n_special_pad_to=260),
                      GenerationConfig(max_tokens=72, seed=3),
                      cache_dtype=jnp.float32)
        out = r.generate("Go", tools=[tool], force_tool_call=True)
        obj = json.loads(out)
        call = obj["tool_call"]
        assert call["name"] == "navigate"
        args = call["arguments"]
        assert set(args) <= {"direction", "distance_m", "announce"}
        assert args["direction"] in ("left", "right", "forward")
        assert isinstance(args["distance_m"], (int, float))
        if "announce" in args:
            assert isinstance(args["announce"], bool)


class TestJsonAcceptorEscapes:
    """The strictened escape rules also apply to the generic acceptor."""

    def test_legal_and_illegal_escapes(self):
        def run(text):
            a = JsonAcceptor(root_object_only=False)
            for ch in text:
                if not a.feed(ch):
                    return False
            return a.done

        assert run('"a\\nb"')
        assert run('"\\u00Ff"')
        assert not run('"a\\qb"')
        assert not run('"\\u12g4"')

    def test_closure_through_unicode_escape(self):
        a = JsonAcceptor(root_object_only=False)
        for ch in '"x\\u1':
            assert a.feed(ch)
        json.loads('"x\\u1' + a.closure())


class TestJsonResponseMode:
    """llama.cpp response_format parity: constrain a FREE reply (no
    tool-call skeleton) to valid JSON, optionally schema-conforming."""

    def test_runner_json_mode(self):
        cfg = llm_model.LLMConfig.tiny()._replace(vocab_size=260)
        params = llm_model.init_params(jax.random.PRNGKey(1), cfg,
                                       dtype=jnp.float32)
        r = LLMRunner(params, cfg, ByteTokenizer(n_special_pad_to=260),
                      GenerationConfig(max_tokens=48, seed=5),
                      cache_dtype=jnp.float32)
        out = r.generate("Describe the scene", json_mode=True)
        obj = json.loads(out)
        assert isinstance(obj, dict)

    def test_runner_response_schema(self):
        cfg = llm_model.LLMConfig.tiny()._replace(vocab_size=260)
        params = llm_model.init_params(jax.random.PRNGKey(2), cfg,
                                       dtype=jnp.float32)
        schema = {"type": "object",
                  "properties": {"risk": {"enum": ["low", "high"]},
                                 "obstacles": {"type": "array",
                                               "items": {"type": "string"},
                                               "maxItems": 2}},
                  "required": ["risk"]}
        r = LLMRunner(params, cfg, ByteTokenizer(n_special_pad_to=260),
                      GenerationConfig(max_tokens=56, seed=6),
                      cache_dtype=jnp.float32)
        out = r.generate("Assess", response_schema=schema)
        obj = json.loads(out)
        assert obj["risk"] in ("low", "high")
        if "obstacles" in obj:
            assert isinstance(obj["obstacles"], list)
            assert len(obj["obstacles"]) <= 2
            assert all(isinstance(x, str) for x in obj["obstacles"])

    def test_runner_exclusive_with_force_tool_call(self):
        cfg = llm_model.LLMConfig.tiny()._replace(vocab_size=260)
        params = llm_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.float32)
        r = LLMRunner(params, cfg, ByteTokenizer(n_special_pad_to=260),
                      GenerationConfig(max_tokens=8, seed=0),
                      cache_dtype=jnp.float32)
        with pytest.raises(Exception):
            r.generate("x", tools=[ToolDefinition("go", "m", {})],
                       force_tool_call=True, json_mode=True)

    def test_server_json_mode_and_schema(self):
        from trackiellm_tpu.llm.server import LLMServer

        cfg = llm_model.LLMConfig.tiny()._replace(vocab_size=260)
        params = llm_model.init_params(jax.random.PRNGKey(4), cfg,
                                       dtype=jnp.float32)
        tok = ByteTokenizer(n_special_pad_to=260)
        server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        try:
            schema = {"type": "object",
                      "properties": {"ok": {"type": "boolean"}},
                      "required": ["ok"]}
            f1 = server.submit("status", max_tokens=32, json_mode=True)
            f2 = server.submit("status", max_tokens=32,
                               response_schema=schema)
            obj1 = json.loads(f1.result(timeout=300))
            obj2 = json.loads(f2.result(timeout=300))
            assert isinstance(obj1, dict)
            assert isinstance(obj2["ok"], bool)
        finally:
            server.close()

    def test_server_typed_tool_schemas(self):
        from trackiellm_tpu.llm.server import LLMServer

        cfg = llm_model.LLMConfig.tiny()._replace(vocab_size=260)
        params = llm_model.init_params(jax.random.PRNGKey(4), cfg,
                                       dtype=jnp.float32)
        tok = ByteTokenizer(n_special_pad_to=260)
        server = LLMServer(params, cfg, batch_slots=2, tokenizer=tok,
                           cache_dtype=jnp.float32, chunk_steps=4)
        try:
            text = server.generate("go", max_tokens=72,
                                   tool_names=["navigate"],
                                   tool_schemas={"navigate": NAV})
            obj = json.loads(text)
            args = obj["tool_call"]["arguments"]
            assert args["direction"] in ("left", "right", "forward")
            assert isinstance(args["distance_m"], (int, float))
        finally:
            server.close()


class TestStrictEmptyObject:
    def test_explicit_empty_properties(self):
        s = {"type": "object", "properties": {}}
        assert accepts(s, "{}")
        assert accepts(s, "{ \n }")
        assert not accepts(s, '{"a":1}')
        acc = SchemaAcceptor(s)
        assert acc.feed_text("{")
        assert acc.closure() == "}"

    def test_absent_properties_is_any_object(self):
        s = {"type": "object"}
        assert accepts(s, '{"anything":[1,2]}')
        assert accepts(s, "{}")
