"""Process runtime: message-driven dispatch + deterministic replay
(mirrors the reference's AO message tests, tests/tfhe.test.js, via Action
tags instead of Lua Eval)."""

import json
import numpy as np

from eoc_tfhe_tpu.process import Process
from eoc_tfhe_tpu.core.params import test_params as make_test_params

ENV = json.dumps({"Process": {"Id": "AOS", "Owner": "FOOBAR", "Module": "M1"}})


def msg(action, data="", **tags):
    t = [{"name": "Action", "value": action}]
    t += [{"name": k, "value": str(v)} for k, v in tags.items()]
    return json.dumps({"Tags": t, "Data": data, "Block-Height": 100})


def out(resp):
    r = json.loads(resp)
    assert r["Error"] is None, r["Error"]
    return r["Output"]["data"]["output"]


def test_process_full_flow():
    p = Process(params=make_test_params())
    assert "TFHE Library" in out(p.handle(msg("Info"), ENV))
    key = out(p.handle(msg("GenerateSecretKey", Token="h.p"), ENV))
    assert len(key) > 100
    ct = out(p.handle(msg("EncryptInteger", Value=42), ENV))
    assert out(p.handle(msg("DecryptInteger", data=ct, Token="h.p"), ENV)) == "42"
    c1 = out(p.handle(msg("EncryptInteger", Value=15), ENV))
    c2 = out(p.handle(msg("EncryptInteger", Value=27), ENV))
    s = out(p.handle(msg("AddCiphertexts", data=json.dumps([c1, c2])), ENV))
    assert out(p.handle(msg("DecryptInteger", data=s, Token="h.p"), ENV)) == "42"
    d = out(p.handle(msg("SubtractCiphertexts",
                         data=json.dumps([out(p.handle(msg("EncryptInteger", Value=50), ENV)),
                                          out(p.handle(msg("EncryptInteger", Value=8), ENV))])), ENV))
    assert out(p.handle(msg("DecryptInteger", data=d, Token="h.p"), ENV)) == "42"


def test_process_string_roundtrip():
    p = Process(params=make_test_params())
    out(p.handle(msg("GenerateSecretKey", Token="h.p"), ENV))
    ct = out(p.handle(msg("EncryptASCIIString", data="Hello TFHE!"), ENV))
    got = out(p.handle(msg("DecryptASCIIString", data=ct, Token="h.p", Length=11), ENV))
    assert got == "Hello TFHE!"


def test_process_error_surface():
    p = Process(params=make_test_params())
    r = json.loads(p.handle(msg("NoSuchAction"), ENV))
    assert "no handler" in r["Error"]
    out(p.handle(msg("GenerateSecretKey", Token="h.p"), ENV))
    r = json.loads(p.handle(msg("DecryptInteger", data="!!!corrupt!!!", Token="h.p"), ENV))
    assert r["Error"] is not None  # survives bad input deterministically


def test_process_replay_determinism():
    p = Process(params=make_test_params())
    out(p.handle(msg("GenerateSecretKey", Token="h.p"), ENV))
    ct = out(p.handle(msg("EncryptInteger", Value=123), ENV))
    # Replay the log on a fresh process: same key material, same decryption.
    p2 = p.replay()
    assert out(p2.handle(msg("DecryptInteger", data=ct, Token="h.p"), ENV)) == "123"
    # And the exported key blobs are identical (bit-exact determinism).
    k1 = out(Process.from_log(p.log[:1], params=make_test_params())
             .handle(msg("GenerateSecretKey", Token="h.p"), ENV))
    assert isinstance(k1, str)


def test_eval_handler_reference_style():
    """The reference test style: drive the API via Eval Data programs
    (tests/tfhe.test.js sends Lua like `Tfhe.generateSecretKey(...)`)."""
    p = Process(params=make_test_params())
    r = out(p.handle(msg("Eval", data='Tfhe.info()'), ENV))
    assert "TFHE Library" in r
    out(p.handle(msg("Eval", data='key = Tfhe.generateSecretKey("h.p", "")'), ENV))
    ct = out(p.handle(msg("Eval", data='ct = Tfhe.encryptInteger(42, "")'), ENV))
    got = out(p.handle(msg("Eval", data='Tfhe.decryptInteger(ct, "", "h.p", "")'), ENV))
    assert got == "42"
    # Variables persist across messages; add 15+27 like the reference test.
    prog = ('a = Tfhe.encryptInteger(15, "")\n'
            'b = Tfhe.encryptInteger(27, "")\n'
            's = Tfhe.addCiphertexts(a, b, "")\n'
            'Tfhe.decryptInteger(s, "", "h.p", "")')
    assert out(p.handle(msg("Eval", data=prog), ENV)) == "42"


def test_eval_rejects_escapes():
    p = Process(params=make_test_params())
    out(p.handle(msg("GenerateSecretKey", Token="h.p"), ENV))
    # Python escape attempts are either Lua syntax errors or calls of nil
    # (the sandbox exposes no Python attributes — the Tfhe bridge is a table
    # of 11 bound closures, nothing else).
    for bad in ["__import__('os')", "open('/etc/passwd')",
                "import os", "Tfhe.__class__()", "(lambda: 1)()",
                "getattr(Tfhe, '_s')", "os.execv('/bin/sh', {})"]:
        r = json.loads(p.handle(msg("Eval", data=bad), ENV))
        assert r["Error"] is not None, bad
    # Indexing a private name is merely nil — not an escape.
    r = json.loads(p.handle(msg("Eval", data="return Tfhe._s"), ENV))
    assert r["Error"] is None and r["Output"]["data"]["output"] == ""


def test_router_delivers_between_processes():
    from eoc_tfhe_tpu.process import Router
    alice = Process(params=make_test_params(), process_id="alice")
    bob = Process(params=make_test_params(), process_id="bob")
    router = Router()
    router.register(alice)
    router.register(bob)
    # bob needs a key to evaluate forwarded programs
    router.push("bob", {"Tags": [{"name": "Action", "value": "GenerateSecretKey"},
                                 {"name": "Token", "value": "h.p"}]})
    # alice forwards an Eval program to bob via her Send handler
    resp = router.push("alice", {
        "Tags": [{"name": "Action", "value": "Send"},
                 {"name": "Target", "value": "bob"},
                 {"name": "Forward-Action", "value": "Eval"}],
        "Data": 'Tfhe.info()'})
    assert resp[0]["Error"] is None and resp[0]["Output"]["data"]["output"] == "OK"
    assert "TFHE Library" in resp[1]["Output"]["data"]["output"]


def test_published_module_readme_program():
    """The published module README's own usage example
    (/root/reference/9qK8.../README.md:36-63 and 70-118) runs through Eval:
    Process.load resolves the published module id to the TFHE backend,
    Process.env carries creation-time values, handlers registered by the
    chunk compute over encrypted state."""
    import json as _json
    from eoc_tfhe_tpu.process import Process
    p = Process(params=make_test_params(), process_id="readme-proc",
                process_env={"JWT_TOKEN": "h.p", "JWKS": ""})
    env = _json.dumps({"Process": {"Id": "readme-proc", "Owner": "F",
                                   "Module": "M1"}})

    def ev(data):
        msg = _json.dumps({
            "Target": "readme-proc", "From": "F", "Owner": "F",
            "Block-Height": "1", "Id": "m", "Module": "M",
            "Tags": [{"name": "Action", "value": "Eval"}], "Data": data})
        r = _json.loads(p.handle(msg, env))
        assert r["Error"] is None, r["Error"]
        return r["Output"]["data"]["output"]

    out = ev("""
        local tfhe = Process.load("9qK8gsMKL2ZVOyP7DlPnEXKh_li2Fl_6liydOjprnPQ")
        local secret_key = tfhe.generateSecretKey(Process.env.JWT_TOKEN, Process.env.JWKS)
        local encrypted_a = tfhe.encryptInteger(42, '')
        local encrypted_b = tfhe.encryptInteger(23, '')
        local encrypted_sum = tfhe.addCiphertexts(encrypted_a, encrypted_b, '')
        local result = tfhe.decryptInteger(encrypted_sum, '', Process.env.JWT_TOKEN, Process.env.JWKS)
        return "The sum is: " .. result
    """)
    assert out.endswith("The sum is: 65")

    # stateful handler pattern from the README (state table + table.insert)
    ev("""
        state = { encrypted_data = {} }
        local tfhe = Process.load("tfhe")
        Handlers.add("encrypt", function(msg)
            local value = tonumber(msg.Data)
            table.insert(state.encrypted_data, tfhe.encryptInteger(value, ''))
            return "Value encrypted and stored"
        end)
        Handlers.add("compute-sum", function(msg)
            local sum = state.encrypted_data[1]
            for i = 2, #state.encrypted_data do
                sum = tfhe.addCiphertexts(sum, state.encrypted_data[i], '')
            end
            return "Sum of encrypted values: " ..
                tfhe.decryptInteger(sum, '', Process.env.JWT_TOKEN, '')
        end)
        return "registered"
    """)

    def action(name, data=""):
        msg = _json.dumps({
            "Target": "readme-proc", "From": "F", "Owner": "F",
            "Block-Height": "2", "Id": "m2", "Module": "M",
            "Tags": [{"name": "Action", "value": name}], "Data": data})
        r = _json.loads(p.handle(msg, env))
        assert r["Error"] is None, r["Error"]
        return r["Output"]["data"]["output"]

    assert "stored" in action("encrypt", "15")
    assert "stored" in action("encrypt", "27")
    assert action("compute-sum").endswith("Sum of encrypted values: 42")

    # unknown module ids are rejected, not silently aliased
    msg = _json.dumps({
        "Target": "readme-proc", "From": "F", "Owner": "F",
        "Block-Height": "3", "Id": "m3", "Module": "M",
        "Tags": [{"name": "Action", "value": "Eval"}],
        "Data": "return Process.load('not-a-module')"})
    r = _json.loads(p.handle(msg, env))
    assert r["Error"] and "unknown module" in r["Error"]


def test_bootstrapped_uint8_via_lua():
    """The bootstrapped 8-bit ops are reachable from the Lua surface."""
    import json as _json
    from eoc_tfhe_tpu.process import Process
    p = Process(params=make_test_params(), process_id="u8")
    env = _json.dumps({"Process": {"Id": "u8", "Owner": "F", "Module": "M"}})
    msg = _json.dumps({
        "Target": "u8", "From": "F", "Owner": "F", "Block-Height": "1",
        "Id": "m", "Module": "M",
        "Tags": [{"name": "Action", "value": "Eval"}],
        "Data": """
            Tfhe.generateSecretKey('h.p', '')
            local a = Tfhe.encryptUint8(50, '')
            local b = Tfhe.encryptUint8(8, '')
            local d = Tfhe.subtractUint8(a, b, '')
            local m = Tfhe.multiplyUint8(a, b, '')
            local lt = Tfhe.lessThanUint8(b, a, '')
            local mn = Tfhe.selectUint8(lt, b, a, '')
            return 'diff=' .. Tfhe.decryptUint8(d, '', 'h.p', '')
                .. ' prod=' .. Tfhe.decryptUint8(m, '', 'h.p', '')
                .. ' min=' .. Tfhe.decryptUint8(mn, '', 'h.p', '')
        """})
    r = _json.loads(p.handle(msg, env))
    assert r["Error"] is None, r["Error"]
    assert r["Output"]["data"]["output"].endswith("diff=42 prod=144 min=8")


def test_bootstrapped_uint8_seeded_via_lua():
    """Wire-compressed (seeded-mask) uint8 blobs interoperate with full
    ones across the whole Lua surface: a seeded and a plain operand mix in
    one bootstrapped subtraction (UID sniff in api._import_bits)."""
    import json as _json
    from eoc_tfhe_tpu.process import Process
    p = Process(params=make_test_params(), process_id="u8s")
    env = _json.dumps({"Process": {"Id": "u8s", "Owner": "F", "Module": "M"}})
    msg = _json.dumps({
        "Target": "u8s", "From": "F", "Owner": "F", "Block-Height": "1",
        "Id": "m", "Module": "M",
        "Tags": [{"name": "Action", "value": "Eval"}],
        "Data": """
            Tfhe.generateSecretKey('h.p', '')
            local a = Tfhe.encryptUint8Seeded(50, '')
            local b = Tfhe.encryptUint8(8, '')
            local d = Tfhe.subtractUint8(a, b, '')
            local roundtrip = Tfhe.decryptUint8(Tfhe.encryptUint8Seeded(7, ''), '', 'h.p', '')
            return 'diff=' .. Tfhe.decryptUint8(d, '', 'h.p', '') .. ' rt=' .. roundtrip .. ' len=' .. #a .. '/' .. #b
        """})
    r = _json.loads(p.handle(msg, env))
    assert r["Error"] is None, r["Error"]
    out = r["Output"]["data"]["output"]
    assert "diff=42 rt=7" in out
    # the seeded blob really is the compressed wire format: 8x32 B vs
    # 8x(12+4n) B records (~2.5x at the tiny test n; ~79x at n=630)
    la, lb = out.split("len=")[1].split("/")
    assert int(la) < int(lb)
