"""aos-runtime parity: the reference's own Lua test programs run through
``Process.handle`` via Eval Data alone (round-2 VERDICT item 4).

The six cases below are the reference integration suite
(``/root/reference/tests/tfhe.test.js:52-186``) with only the ``${tkn}`` /
``${jwks}`` template substitutions applied — the Lua chunks are otherwise
verbatim.  Plus: pattern-matched ``Handlers.add`` registration, the
deterministic ``.crypto`` RNG, and interpreter unit coverage.
"""

import json

import pytest

from eoc_tfhe_tpu import lua
from eoc_tfhe_tpu.process import Process, Router
from eoc_tfhe_tpu.core.params import test_params as make_test_params

TKN = "h.p"
JWKS = ""

ENV = json.dumps({"Process": {"Id": "AOS", "Owner": "FOOBAR", "Module": "M1"}})


def eval_msg(data):
    return json.dumps({
        "Target": "AOS", "From": "FOOBAR", "Owner": "FOOBAR",
        "Block-Height": "1000", "Id": "test", "Module": "TFHE",
        "Tags": [{"name": "Action", "value": "Eval"}], "Data": data})


def out(resp):
    r = json.loads(resp)
    assert r["Error"] is None, r["Error"]
    return r["Output"]["data"]["output"]


@pytest.fixture(scope="module")
def proc():
    return Process(params=make_test_params())


def test_reference_case_2_info(proc):
    # tests/tfhe.test.js:56-76 (case 1 is loader init — n/a)
    output = out(proc.handle(eval_msg(f'''
        local tfhe = require(".tfhe")
        local info = tfhe.info()
        tfhe.testJWT();
        print(info)
        return "OK"
      '''), ENV))
    assert "TFHE" in output and output.endswith("OK")


def test_reference_case_3_int_roundtrip(proc):
    # tests/tfhe.test.js:78-104
    output = out(proc.handle(eval_msg(f'''
        local tfhe = require(".tfhe")

        -- Generate secret key first
        tfhe.generateSecretKey("{TKN}", "{JWKS}")

        -- Test integer encryption/decryption
        local original = 42
        local encrypted = tfhe.encryptInteger(original, '')
        local decrypted = tfhe.decryptInteger(encrypted, '', "{TKN}", "{JWKS}")

        return tostring(decrypted)
      '''), ENV))
    assert output == "42"


def test_reference_case_4_string_roundtrip(proc):
    # tests/tfhe.test.js:106-128
    output = out(proc.handle(eval_msg(f'''
        local tfhe = require(".tfhe")

        local text = "Hello TFHE!"
        local encrypted = tfhe.encryptASCIIString(text, #text, '')
        local decrypted = tfhe.decryptASCIIString(encrypted, #text, '', "{TKN}", "{JWKS}")

        return decrypted
      '''), ENV))
    assert output == "Hello TFHE!"


def test_reference_case_5_homomorphic_addition(proc):
    # tests/tfhe.test.js:130-157
    output = out(proc.handle(eval_msg(f'''
        local tfhe = require(".tfhe")

        local a = 15
        local b = 27

        local enc_a = tfhe.encryptInteger(a, '')
        local enc_b = tfhe.encryptInteger(b, '')

        local enc_sum = tfhe.addCiphertexts(enc_a, enc_b, '')
        local sum = tfhe.decryptInteger(enc_sum, '', "{TKN}", "{JWKS}")

        return tostring(sum)
      '''), ENV))
    assert output == "42"


def test_reference_case_6_homomorphic_subtraction(proc):
    # tests/tfhe.test.js:159-186. NB the reference expects "58" because its
    # Lua layer aliases subtract to add (tfhe.lua:41-43 — SURVEY.md appendix
    # A); this framework implements real subtraction, so 50 - 8 = 42.
    output = out(proc.handle(eval_msg(f'''
        local tfhe = require(".tfhe")

        local a = 50
        local b = 8

        local enc_a = tfhe.encryptInteger(a, '')
        local enc_b = tfhe.encryptInteger(b, '')

        local enc_diff = tfhe.subtractCiphertexts(enc_a, enc_b, '')
        local diff = tfhe.decryptInteger(enc_diff, '', "{TKN}", "{JWKS}")

        return tostring(diff)
      '''), ENV))
    assert output == "42"


def test_handlers_pattern_matched_dispatch():
    """aos-style Handlers.add(name, matcher, fn): register from Lua, then
    dispatch a non-Eval message through the matcher."""
    p = Process(params=make_test_params())
    out(p.handle(eval_msg('''
        counter = 0
        Handlers.add("ping",
          Handlers.utils.hasMatchingTag("Action", "Ping"),
          function (msg)
            counter = counter + 1
            ao.send({ Target = msg.From, Data = "pong " .. counter })
            return "ponged " .. msg.From
          end)
        Handlers.add("echo-data",
          function (msg) return msg.Action == "Echo" end,
          function (msg) return "echo:" .. msg.Data end)
        return "registered"
      '''), ENV))

    ping = json.dumps({"From": "caller-1", "Block-Height": 100,
                       "Tags": [{"name": "Action", "value": "Ping"}]})
    r = json.loads(p.handle(ping, ENV))
    assert r["Error"] is None
    assert r["Output"]["data"]["output"] == "ponged caller-1"
    assert r["Messages"][0]["Target"] == "caller-1"
    assert r["Messages"][0]["Data"] == "pong 1"

    echo = json.dumps({"From": "x", "Block-Height": 100, "Data": "hi",
                       "Tags": [{"name": "Action", "value": "Echo"}]})
    assert json.loads(p.handle(echo, ENV))["Output"]["data"]["output"] == "echo:hi"

    # unmatched action still errors
    nope = json.dumps({"Tags": [{"name": "Action", "value": "Nope"}]})
    assert json.loads(p.handle(nope, ENV))["Error"] is not None

    # lua state (counter) persists across handler invocations
    r2 = json.loads(p.handle(ping, ENV))
    assert r2["Messages"][0]["Data"] == "pong 2"


def test_crypto_module_deterministic():
    """.crypto analog: same chain coordinates -> same random stream."""
    prog = '''
        local c = require(".crypto")
        local a = c.integer(1, 1000000)
        local b = c.integer(1, 1000000)
        return a .. "," .. b
    '''
    p1 = Process(params=make_test_params())
    p2 = Process(params=make_test_params())
    o1 = out(p1.handle(eval_msg(prog), ENV))
    o2 = out(p2.handle(eval_msg(prog), ENV))
    assert o1 == o2
    # different chain coordinates -> different stream
    env2 = json.dumps({"Process": {"Id": "OTHER", "Owner": "X", "Module": "M"}})
    p3 = Process(params=make_test_params())
    assert out(p3.handle(eval_msg(prog), env2)) != o1


def test_interpreter_language_coverage():
    outs = []
    G = lua.make_stdlib(outs.append, lua.Crypto(1))
    ret, _ = lua.run('''
        local acc = {}
        for i = 1, 5 do acc[#acc + 1] = i * i end
        local j, total = 1, 0
        while j <= #acc do total = total + acc[j]; j = j + 1 end
        repeat total = total + 1 until total > 55
        local obj = { n = 0 }
        function obj:bump(k) self.n = self.n + k; return self.n end
        obj:bump(3); obj:bump(4)
        local s = "a,b,c"
        local head = s:sub(1, (s:find(",")) - 1)
        return total, obj.n, table.concat(acc, "-"), head,
               ("%d/%s"):format(7, "x"), 2^10, 7 // 2, 7 % 3, -2 < 1,
               not nil, "x" ~= "y"
    ''', G)
    assert ret == [56, 7, "1-4-9-16-25", "a", "7/x", 1024.0, 3, 1, True,
                   True, True]


def test_eval_state_persists_and_json(proc):
    out(proc.handle(eval_msg('stash = json.encode({k = "v"})'), ENV))
    got = out(proc.handle(eval_msg('return json.decode(stash).k'), ENV))
    assert got == "v"


def test_router_with_lua_handlers():
    alice = Process(params=make_test_params(), process_id="alice")
    bob = Process(params=make_test_params(), process_id="bob")
    router = Router()
    router.register(alice)
    router.register(bob)
    router.push("bob", {"Tags": [{"name": "Action", "value": "Eval"}],
                        "Data": '''
        Handlers.add("greet",
          Handlers.utils.hasMatchingTag("Action", "Greet"),
          function (msg) return "hello " .. msg.From end)
        return "ok"'''})
    resp = router.push("alice", {
        "Tags": [{"name": "Action", "value": "Send"},
                 {"name": "Target", "value": "bob"},
                 {"name": "Forward-Action", "value": "Greet"}],
        "Data": ""})
    assert resp[1]["Output"]["data"]["output"] == "hello alice"


# ---------------------------------------------------------------------------
# ADVICE r3 hardening: memory rail, nil-local shadowing, pcall coverage
# ---------------------------------------------------------------------------

def _fresh_interp():
    return lua.make_stdlib(print_sink=lambda s: None, modules={})


def _run(G, src):
    vals, _ = lua.run(src, G)
    return vals


def test_string_rep_memory_rail():
    interp = _fresh_interp()
    with pytest.raises(lua.LuaError, match="memory limit"):
        _run(interp, "return string.rep('aaaaaaaa', 2^40)")


def test_concat_doubling_memory_rail():
    """~40 iterations of s = s .. s would be a TB-scale string; the rail
    stops it long before host memory is at risk (the reference wasm runs
    under an AO Memory-Limit tag)."""
    interp = _fresh_interp()
    with pytest.raises(lua.LuaError, match="memory limit"):
        _run(interp, """
            local s = 'xxxxxxxxxxxxxxxx'
            for i = 1, 40 do s = s .. s end
            return #s
        """)


def test_format_width_memory_rail():
    interp = _fresh_interp()
    with pytest.raises(lua.LuaError, match="memory limit"):
        _run(interp, "return string.format('%999999999d', 1)")


def test_format_many_specifiers_memory_rail():
    """Each width below the per-run cap, but the JOINED result far above it
    — the incremental result charge trips the rail (r4 ADVICE low)."""
    interp = _fresh_interp()
    with pytest.raises(lua.LuaError, match="memory limit"):
        _run(interp, """
            local spec = string.rep('%1000000d', 20)
            return string.format(spec, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
                                 7, 7, 7, 7, 7, 7, 7, 7, 7, 7)
        """)
    # and the result length is charged against the cumulative allocation
    # rail (not just the single-string cap)
    G2 = _fresh_interp()
    _vals, interp2 = lua.run("return string.format('%100d', 1)", G2)
    assert interp2.str_alloc >= 100


def test_normal_strings_unaffected():
    interp = _fresh_interp()
    assert _run(interp, "return string.rep('ab', 3, '-')") == ["ab-ab-ab"]
    assert _run(interp, "return ('x'):rep(4) .. 'y'") == ["xxxxy"]


def test_local_nil_shadows_global():
    """ADVICE r3: a local bound to nil must shadow a global of the same
    name, not fall through to it (Lua scoping semantics)."""
    interp = _fresh_interp()
    assert _run(interp, """
        x = 5
        local function f()
            local x = nil
            return x
        end
        return f(), x
    """) == [None, 5]


def test_pcall_catches_host_errors():
    """ADVICE r3: errors raised inside bound host functions (plain Python
    exceptions) must surface as pcall's (false, err), not abort the Eval."""
    G = _fresh_interp()

    def boom():
        raise ValueError("host exploded")
    G.set("boom", boom)
    ok, err = _run(G, "local ok, err = pcall(boom); return ok, err")
    assert ok is False and "host exploded" in err
    # stdlib failure path: string.rep with a non-numeric count
    ok2, err2 = _run(G, "local ok, e = pcall(string.rep, 'a', 'zz'); return ok, e")
    assert ok2 is False and err2


def test_format_error_semantics():
    """Malformed format strings raise Lua-level errors, not host
    IndexErrors (r5 review): trailing '%' and missing arguments."""
    G = _fresh_interp()
    with pytest.raises(lua.LuaError, match="invalid format string"):
        _run(G, "return string.format('abc%')")
    with pytest.raises(lua.LuaError, match="no value"):
        _run(G, "return string.format('%d %d', 1)")
    # and both are catchable from Lua with pcall
    vals = _run(G, "local ok, e = pcall(string.format, 'x%'); return ok")
    assert vals == [False]


def test_r5_review_semantics_fixes():
    """Lua-semantics fixes from the r5 targeted review: gsub count/replace
    escapes, string.byte negative index, pattern '.'/anchor behavior,
    shared math.random seed, and the rail surviving __interp__ tampering."""
    G = _fresh_interp()
    # gsub: n=0 replaces NOTHING (Python count=0 would mean unlimited)
    assert _run(G, 'return string.gsub("aaa", "a", "b", 0)') == ["aaa", 0]
    # gsub: %0 whole match, %% literal percent
    assert _run(G, 'return string.gsub("abc", "b", "[%0]")') == ["a[b]c", 1]
    assert _run(G, 'return string.gsub("x", "x", "100%%")') == ["100%", 1]
    # gsub: %1 = whole match when the pattern has no captures
    assert _run(G, 'return string.gsub("ab", "a", "<%1>")') == ["<a>b", 1]
    # string.byte: -1 is the LAST char; 0 is no value
    assert _run(G, 'return string.byte("abc", -1)') == [99]
    assert _run(G, 'return string.byte("abc", 0)') == [None] or \
        _run(G, 'return string.byte("abc", 0)') == []
    # '.' crosses newlines (Lua any-char), mid-pattern ^ $ are literals
    assert _run(G, 'return string.match("l1\\nl2", "(.*)")') == ["l1\nl2"]
    assert _run(G, 'return string.find("a^b", "a^b")') == [1, 3]
    # trailing % is a Lua error, not a host IndexError
    with pytest.raises(lua.LuaError, match="malformed pattern"):
        _run(G, 'return string.find("x", "x%")')
    # math.randomseed affects math.random (shared default instance)
    G2 = _fresh_interp()
    a = _run(G2, 'math.randomseed(42); return math.random(1, 10^9)')
    G3 = _fresh_interp()
    b = _run(G3, 'math.randomseed(42); return math.random(1, 10^9)')
    G4 = _fresh_interp()
    c = _run(G4, 'math.randomseed(43); return math.random(1, 10^9)')
    assert a == b and a != c
    # the memory rail survives Lua tampering with __interp__ (hidden slot)
    G5 = _fresh_interp()
    with pytest.raises(lua.LuaError, match="memory limit"):
        _run(G5, '''
            __interp__ = nil
            local t = {}
            for i = 1, 200 do t[i] = string.rep("x", 7000000) end
            return #t
        ''')
