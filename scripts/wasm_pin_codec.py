"""Pin the tfhe_io serialization layout constants from the reference wasm.

Parses ``/root/reference/WcCLnB2zVpgkIJd5OECIJTbRXGjzbbPbyxrZemThpuI/process.wasm``
(the shipped reference artifact) with a minimal pure-Python wasm64 reader:

  * section walk (type/import/function/code/data + ``name`` custom section),
  * function-name map from the name section,
  * a small structured-opcode disassembler good enough to recover
    ``i32.const`` immediates and ``call`` targets per function body.

Goal (round-3 VERDICT item 3): replace the "reconstructed by table order"
serialization UIDs in ``eoc_tfhe_tpu/io/tfhe_io.py`` with values proven from
the binary, and recover the SSO-inlined short property-key strings
(``n``/``N``/``k``/``l``/...) that a plain strings-scan cannot see.

Usage: python scripts/wasm_pin_codec.py [--dump NAMESUBSTR] [--consts]
"""

import re
import sys

WASM = ("/root/reference/WcCLnB2zVpgkIJd5OECIJTbRXGjzbbPbyxrZemThpuI/"
        "process.wasm")


def uleb(buf, i):
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def sleb(buf, i):
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        s += 7
        if not b & 0x80:
            if b & 0x40:
                r -= 1 << s
            return r, i


def parse_sections(buf):
    assert buf[:4] == b"\0asm"
    i = 8
    out = []
    while i < len(buf):
        sid = buf[i]
        i += 1
        size, i = uleb(buf, i)
        out.append((sid, i, size))
        i += size
    return out


def name_map(buf, sections):
    for sid, off, size in sections:
        if sid != 0:
            continue
        nlen, i = uleb(buf, off)
        nm = buf[i:i + nlen]
        i += nlen
        if nm != b"name":
            continue
        end = off + size
        names = {}
        while i < end:
            sub = buf[i]
            i += 1
            ssize, i = uleb(buf, i)
            sub_end = i + ssize
            if sub == 1:  # function names
                cnt, i = uleb(buf, i)
                for _ in range(cnt):
                    idx, i = uleb(buf, i)
                    ln, i = uleb(buf, i)
                    names[idx] = buf[i:i + ln].decode("utf-8", "replace")
                    i += ln
            i = sub_end
        return names
    return {}


def func_bodies(buf, sections):
    """Returns (n_imported_funcs, [(start, end) per local function])."""
    n_imports = 0
    bodies = []
    for sid, off, size in sections:
        if sid == 2:  # imports
            cnt, i = uleb(buf, off)
            for _ in range(cnt):
                ln, i = uleb(buf, i)
                i += ln
                ln, i = uleb(buf, i)
                i += ln
                kind = buf[i]
                i += 1
                if kind == 0:
                    _, i = uleb(buf, i)
                    n_imports += 1
                elif kind == 1:  # table
                    i += 1
                    flags = buf[i]
                    i += 1
                    _, i = uleb(buf, i)
                    if flags & 1:
                        _, i = uleb(buf, i)
                elif kind == 2:  # memory
                    flags = buf[i]
                    i += 1
                    _, i = uleb(buf, i)
                    if flags & 1:
                        _, i = uleb(buf, i)
                elif kind == 3:  # global
                    i += 2
        elif sid == 10:  # code
            cnt, i = uleb(buf, off)
            for _ in range(cnt):
                bsize, i = uleb(buf, i)
                bodies.append((i, i + bsize))
                i += bsize
    return n_imports, bodies


# Opcode immediate kinds for the subset we need to skip correctly.
_NO_IMM = set(range(0x45, 0xC5)) | {0x00, 0x01, 0x05, 0x0B, 0x0F, 0x1A, 0x1B,
                                    0xD1}
_ULEB1 = {0x0C, 0x0D, 0x10, 0x20, 0x21, 0x22, 0x23, 0x24, 0x25, 0x26,
          0x3F, 0x40, 0xD0, 0xD2, 0x02, 0x03, 0x04}
_ULEB2 = {0x11}  # call_indirect: type, table
_MEM = set(range(0x28, 0x3F))  # align, offset


def disasm(buf, start, end):
    """Yield (pc, opcode, imm) — enough fidelity for const/call mining."""
    # locals vector
    cnt, i = uleb(buf, start)
    for _ in range(cnt):
        _, i = uleb(buf, i)
        i += 1
    while i < end:
        pc = i
        op = buf[i]
        i += 1
        imm = None
        if op == 0x41:
            imm, i = sleb(buf, i)
        elif op == 0x42:
            imm, i = sleb(buf, i)
        elif op == 0x43:
            i += 4
        elif op == 0x44:
            i += 8
        elif op in _MEM:
            _, i = uleb(buf, i)
            imm, i = uleb(buf, i)
        elif op in _ULEB2:
            a, i = uleb(buf, i)
            b, i = uleb(buf, i)
            imm = (a, b)
        elif op in _ULEB1:
            imm, i = uleb(buf, i)
        elif op == 0x0E:  # br_table
            n, i = uleb(buf, i)
            for _ in range(n + 1):
                _, i = uleb(buf, i)
        elif op == 0xFC:
            sub, i = uleb(buf, i)
            if sub in (10, 11, 8):  # memory.copy/fill/init
                _, i = uleb(buf, i)
                if sub in (10, 8):
                    _, i = uleb(buf, i)
            elif sub <= 7:
                pass
            else:
                _, i = uleb(buf, i)
            imm = sub
        elif op == 0xFD:  # simd
            sub, i = uleb(buf, i)
            if 0 <= sub <= 11 or sub in (92, 93):
                _, i = uleb(buf, i)
                _, i = uleb(buf, i)
            elif sub == 12:
                i += 16
            elif sub == 13:
                i += 16
            elif 21 <= sub <= 34:
                i += 1
            imm = sub
        elif op in _NO_IMM:
            pass
        else:
            # unknown: bail out of this body
            return
        yield pc, op, imm


def main():
    buf = open(WASM, "rb").read()
    sections = parse_sections(buf)
    names = name_map(buf, sections)
    n_imp, bodies = func_bodies(buf, sections)
    by_name = {}
    for idx, nm in names.items():
        by_name.setdefault(nm, idx)

    pat = re.compile(r"Stream|TextModeProperties|Properties|_read|_write",
                     re.I)
    ser_funcs = sorted((idx, nm) for idx, nm in names.items() if pat.search(nm))

    if "--list" in sys.argv:
        for idx, nm in ser_funcs:
            print(idx, nm)
        return

    want = [nm for _, nm in ser_funcs
            if any(k in nm for k in (
                "lweSample", "LweSample", "lweKey", "LweKey", "TLwe", "tLwe",
                "TGsw", "tGsw", "Gate", "KeySwitch", "BootstrappingKey",
                "TextModeProperties"))]
    dump = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--dump=")]
    if dump:
        want = [nm for nm in names.values() if dump[0] in nm]

    for nm in sorted(set(want)):
        idx = by_name[nm]
        body = bodies[idx - n_imp]
        consts = []
        calls = []
        seq = []
        for pc, op, imm in disasm(buf, *body):
            if op == 0x41:
                consts.append(imm)
                seq.append(f"c:{imm}")
            elif op == 0x10:
                callee = names.get(imm, f"f{imm}")
                calls.append(callee)
                seq.append(f"call:{callee.split('(')[0][:48]}")
        small = [c for c in consts if 0 < c < 512]
        print(f"== {nm}  (func {idx}, {body[1]-body[0]} bytes)")
        print(f"   small consts: {sorted(set(small))}")
        uniq_calls = []
        for c in calls:
            if not uniq_calls or uniq_calls[-1] != c:
                uniq_calls.append(c)
        print(f"   calls: {uniq_calls[:18]}")
        if "--seq" in sys.argv:
            print("   seq:", " ".join(seq[:220]))
        print()


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Data-segment pointer resolution (wasm64: offsets are i64.const exprs).
# ---------------------------------------------------------------------------

def data_segments(buf, sections):
    segs = []
    for sid, off, size in sections:
        if sid != 11:
            continue
        cnt, i = uleb(buf, off)
        for _ in range(cnt):
            kind, i = uleb(buf, i)
            if kind == 0:
                op = buf[i]
                i += 1
                if op == 0x41:
                    base, i = sleb(buf, i)
                elif op == 0x42:
                    base, i = sleb(buf, i)
                else:
                    raise ValueError(f"unexpected offset op {op:#x}")
                assert buf[i] == 0x0B
                i += 1
                ln, i = uleb(buf, i)
                segs.append((base, buf[i:i + ln]))
                i += ln
            else:  # passive
                ln, i = uleb(buf, i)
                i += ln
    return segs


def make_resolver(segs):
    def resolve(addr):
        for base, data in segs:
            if base <= addr < base + len(data):
                raw = data[addr - base: addr - base + 48]
                s = raw.split(b"\0")[0]
                if s and all(32 <= c < 127 for c in s[:16]):
                    return s.decode("latin1")
                return "<bin:" + raw[:12].hex() + ">"
        return None
    return resolve


def dump_with_strings(names_filter):
    buf = open(WASM, "rb").read()
    sections = parse_sections(buf)
    names = name_map(buf, sections)
    n_imp, bodies = func_bodies(buf, sections)
    segs = data_segments(buf, sections)
    resolve = make_resolver(segs)
    by_name = {nm: idx for idx, nm in names.items()}

    for nm in names_filter:
        idx = by_name.get(nm)
        if idx is None:
            matches = [n for n in by_name if nm in n]
            if not matches:
                print(f"!! no function matching {nm}")
                continue
            idx = by_name[matches[0]]
            nm = matches[0]
        body = bodies[idx - n_imp]
        print(f"== {nm}  (func {idx}, {body[1]-body[0]} bytes)")
        seq = []
        for pc, op, imm in disasm(buf, *body):
            if op in (0x41, 0x42):
                s = resolve(imm)
                if s is not None:
                    seq.append(f'"{s}"')
                elif -65536 < imm < 65536:
                    seq.append(f"{imm}")
            elif op == 0x10:
                callee = names.get(imm, f"f{imm}")
                seq.append(f"CALL {callee.split('(')[0][:52]}")
        print("   " + "\n   ".join(seq))
        print()
