"""Parse a jax.profiler xplane.pb and print top HLO ops by device self time.

Hand-rolled protobuf wire parser (no TF proto stubs needed in-env) for the
XSpace schema (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes=1 -> XPlane{name=2, lines=3, event_metadata=4(map)}
  XLine{name=2, events=4} -> XEvent{metadata_id=1, duration_ps=3}
  XEventMetadata map entry{key=1, value=2 -> XEventMetadata{id=1, name=2}}

Run:  python tools/parse_xplane.py <xplane.pb> [top_n] [line_filter]
"""

import sys


def varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:  # map entry
            key = None
            md_name = None
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2 and w3 == 2:
                            md_name = v3.decode("utf-8", "replace")
            if key is not None:
                meta[key] = md_name or str(key)
    return name, lines, meta


def parse_line(buf):
    name = ""
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 11 and wt == 2:
            name = v.decode("utf-8", "replace") or name
        elif fno == 4 and wt == 2:
            events.append(v)
    return name, events


def parse_event(buf):
    mid = 0
    dur = 0
    for fno, wt, v in fields(buf):
        if fno == 1 and wt == 0:
            mid = v
        elif fno == 3 and wt == 0:
            dur = v
    return mid, dur


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    line_filter = sys.argv[3] if len(sys.argv) > 3 else None

    data = open(path, "rb").read()
    for fno, wt, v in fields(data):
        if fno != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(v)
        keep = "TPU" in pname or "TensorCore" in pname
        print(f"== plane: {pname}  ({len(lines)} lines)"
              + ("" if keep else "  [skipped]"))
        if not keep:
            continue
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if line_filter and line_filter not in lname:
                continue
            agg = {}
            for ebuf in events:
                mid, dur = parse_event(ebuf)
                nm = meta.get(mid, str(mid))
                agg[nm] = agg.get(nm, 0.0) + dur
            total = sum(agg.values())
            print(f"-- line: {lname}: {len(events)} events, "
                  f"{total / 1e9:.2f} ms total")
            if not events:
                continue
            for nm, d in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
                print(f"  {d / 1e9:9.3f} ms  {nm[:120]}")


if __name__ == "__main__":
    main()
