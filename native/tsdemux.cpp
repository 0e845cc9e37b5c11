// Native MPEG2-TS demux engine: sync scan + PID routing + PES assembly.
//
// The steady-state per-packet loop of the TS splitter runs here; Python keeps
// the control plane (PSI tables, service selection, clock interpolation,
// 3-phase init with rewind-and-replay). Semantics mirror the pure-Python
// layer exactly (amatsukaze_tpu/ts/packet.py, pes.py), which itself follows
// the reference behaviour (Amatsukaze/Mpeg2TsParser.hpp:274-432 — studied,
// not copied).
//
// Event stream (ordered, int64 meta x6 per event):
//   [type, pid, data_off, data_len, packet_index, extra]
//   type 0 = assembled + validated PES unit   (extra = 0)
//   type 1 = raw 188-byte packet (PSI pids)   (extra = 0)
//   type 2 = PCR value on the PCR pid         (extra = PCR in 27MHz units)
//   type 3 = paused at a control packet: the packet is NOT consumed; Python
//            must handle it (PAT/PMT), update pid modes, then resume.
//
// PID modes: 0 = ignore, 1 = PES assembly, 2 = raw delivery, 3 = pause.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPacketLen = 188;
constexpr uint8_t kSync = 0x47;
constexpr int kCheckPacketNum = 8;  // consecutive syncs proving resync
constexpr int kNumPids = 8192;

struct PesState {
    std::vector<uint8_t> buf;
    uint8_t cc = 0;
};

struct Event {
    int64_t type, pid, off, len, packet_index, extra;
};

struct Engine {
    std::vector<uint8_t> inbuf;   // unscanned input tail
    bool sync_ok = false;
    int64_t packet_count = 0;     // packets delivered to routing
    int64_t scramble_count = 0;
    int64_t cc_error_count = 0;
    int64_t selected_total = 0;     // packets on PES-mode pids (mirror of
    int64_t selected_scramble = 0;  // TsSplitter._check_scramble counters)
    uint8_t pid_mode[kNumPids] = {0};
    int pcr_pid = -1;
    PesState pes[kNumPids];       // lazily used; vector stays empty unless pid active
    std::vector<Event> events;
    std::vector<uint8_t> edata;   // event payload arena
    size_t scan_pos = 0;          // resume point inside inbuf
    bool paused = false;
};

inline int pid_of(const uint8_t* p) { return ((p[1] & 0x1F) << 8) | p[2]; }

// packet.check() reject set (packet.py:136-148)
inline bool packet_check(const uint8_t* p) {
    if (p[0] != kSync) return false;
    int pid = pid_of(p);
    if (pid >= 0x0002 && pid <= 0x000F) return false;
    int tsc = (p[3] >> 6) & 3;
    if (tsc == 0x01) return false;
    int afc = (p[3] >> 4) & 3;
    if (afc == 0x00) return false;
    if ((afc & 1) && (afc & 2) && (4 + 1 + p[4]) >= kPacketLen) return false;
    return true;
}

inline int payload_offset(const uint8_t* p) {
    int afc = (p[3] >> 4) & 3;
    if (afc & 1) return (afc & 2) ? (4 + 1 + p[4]) : 4;
    return kPacketLen;  // no payload
}

// PESPacket.parse() + check() (pes.py:40-124): validate an assembled unit.
bool pes_valid(const uint8_t* d, size_t n) {
    if (n < 9) return false;
    if (d[3] == 0xBF) return false;  // private_stream_2
    uint8_t flags2 = d[7];
    int need = 0;
    if (flags2 & 0x80) need += 5;
    if (flags2 & 0x40) need += 5;
    if (flags2 & 0x20) need += 6;
    if (flags2 & 0x10) need += 3;
    if (flags2 & 0x08) need += 1;
    if (flags2 & 0x04) need += 1;
    if (flags2 & 0x02) need += 2;
    if (flags2 & 0x01) need += 1;
    int hdl = d[8];
    if (hdl < need) return false;
    // check()
    if (!(d[0] == 0 && d[1] == 0 && d[2] == 1)) return false;
    if ((d[6] & 0xC0) != 0x80) return false;
    int ptsdts = (d[7] >> 6) & 3;
    if (ptsdts == 0x01) return false;
    size_t payload_off = 9 + (size_t)hdl;
    if (payload_off >= n) return false;
    size_t plen = ((size_t)d[4] << 8) | d[5];
    if (plen != 0 && plen + 6 != n) return false;
    return true;
}

void emit_event(Engine* e, int64_t type, int64_t pid, const uint8_t* data,
                int64_t len, int64_t pkt_index, int64_t extra) {
    int64_t off = -1;
    if (data != nullptr && len > 0) {
        off = (int64_t)e->edata.size();
        e->edata.insert(e->edata.end(), data, data + len);
    }
    e->events.push_back({type, pid, off, len, pkt_index, extra});
}

void pes_check_and_out(Engine* e, int pid, const uint8_t* d, size_t n,
                       int64_t pkt_index) {
    if (pes_valid(d, n))
        emit_event(e, 0, pid, d, (int64_t)n, pkt_index, 0);
}

// PesParser.on_ts_packet (pes.py:158-182)
void pes_input(Engine* e, int pid, const uint8_t* p, int64_t pkt_index) {
    PesState& st = e->pes[pid];
    uint8_t cc = p[3] & 0x0F;
    if (cc != st.cc) {
        if (!st.buf.empty()) e->cc_error_count++;
        st.buf.clear();
    }
    st.cc = (cc + 1) & 0x0F;

    int afc = (p[3] >> 4) & 3;
    if (!(afc & 1)) return;  // no payload
    int poff = payload_offset(p);
    bool pusi = (p[1] & 0x40) != 0;
    if (pusi && !st.buf.empty()) {
        pes_check_and_out(e, pid, st.buf.data(), st.buf.size(), pkt_index);
        st.buf.clear();
    }
    st.buf.insert(st.buf.end(), p + poff, p + kPacketLen);

    if (st.buf.size() >= 6) {
        size_t plen = ((size_t)st.buf[4] << 8) | st.buf[5];
        size_t total = plen + 6;
        if (plen != 0 && st.buf.size() >= total) {
            pes_check_and_out(e, pid, st.buf.data(), total, pkt_index);
            st.buf.erase(st.buf.begin(), st.buf.begin() + total);
        }
    }
}

// AdaptationField analysis mirroring TsSystemClock.input_ts_packet
// (splitter.py:67-87): an event fires for EVERY pcr-pid packet whose
// adaptation field parses (the anchor swap happens even without a PCR).
// Event layout: len = flags (bit0 = discontinuity, bit1 = has_pcr),
// extra = 27MHz PCR (0 when absent).
bool analyze_af(const uint8_t* p, int64_t* flags_out, int64_t* pcr_out) {
    int afc = (p[3] >> 4) & 3;
    if (!(afc & 2)) return false;
    int af_len_total = (afc & 1) ? (1 + p[4]) : (kPacketLen - 4);
    if (af_len_total < 2) return false;
    const uint8_t* af = p + 4;  // af[0]=length byte, af[1]=flags
    int64_t flags = (af[1] & 0x80) ? 1 : 0;  // discontinuity
    int64_t pcr = 0;
    int consumed = 2;
    if (af[1] & 0x10) {  // PCR flag
        if (consumed + 6 > af_len_total) return false;  // af.parse() fails
        uint64_t raw = 0;
        for (int i = 0; i < 6; i++) raw = (raw << 8) | af[consumed + i];
        pcr = (int64_t)((raw >> 15) * 300 + (raw & 0x1FF));
        flags |= 2;
        consumed += 6;
    }
    if (af[1] & 0x08) {  // OPCR flag (validity only)
        if (consumed + 6 > af_len_total) return false;
    }
    *flags_out = flags;
    *pcr_out = pcr;
    return true;
}

void maybe_emit_pcr(Engine* e, const uint8_t* p, int pid, int64_t idx) {
    if (pid != e->pcr_pid) return;
    int64_t flags, pcr;
    if (analyze_af(p, &flags, &pcr))
        emit_event(e, 2, pid, nullptr, flags, idx, pcr);
}

// route one verified-sync packet; returns false to PAUSE (packet unconsumed)
bool route_packet(Engine* e, const uint8_t* p) {
    if (!packet_check(p)) { e->packet_count++; return true; }
    int pid = pid_of(p);
    int mode = e->pid_mode[pid];
    if (mode == 3) return false;  // pause BEFORE consuming
    int64_t idx = e->packet_count++;
    bool scrambled = ((p[3] >> 6) & 3) != 0;
    if (scrambled) e->scramble_count++;
    maybe_emit_pcr(e, p, pid, idx);
    if (mode == 1) {
        // mirrors TsSplitter.on_video_packet: scrambled packets are counted
        // and dropped before PES assembly (no CC state update)
        e->selected_total++;
        if (scrambled) e->selected_scramble++;
        else pes_input(e, pid, p, idx);
    } else if (mode == 2) {
        emit_event(e, 1, pid, p, kPacketLen, idx, 0);
    }
    return true;
}

// number of consecutive 188-strided sync bytes from pos (packet.py:210-217)
size_t leading_sync_run(const uint8_t* b, size_t n, size_t pos) {
    size_t run = 0;
    for (size_t q = pos; q < n; q += kPacketLen) {
        if (b[q] != kSync) break;
        run++;
    }
    return run;
}

// first offset >= start where kCheckPacketNum strided syncs hold, else -1
// (packet.py:220-237)
int64_t find_resync(const uint8_t* b, size_t n, size_t start) {
    if (n < (size_t)kCheckPacketNum * kPacketLen) return -1;
    size_t limit = n - (size_t)kCheckPacketNum * kPacketLen;
    for (size_t pos = start; pos <= limit; pos++) {
        if (b[pos] != kSync) continue;
        bool ok = true;
        for (int k = 1; k < kCheckPacketNum; k++) {
            if (b[pos + (size_t)k * kPacketLen] != kSync) { ok = false; break; }
        }
        if (ok) return (int64_t)pos;
    }
    return -1;
}

// TsPacketParser._scan (packet.py:287-320) fused with per-packet routing.
// Returns true when fully scanned; false when paused at a control packet.
bool scan(Engine* e) {
    const uint8_t* b = e->inbuf.data();
    size_t n = e->inbuf.size();
    size_t pos = e->scan_pos;
    bool paused = false;
    while (!paused) {
        if (!e->sync_ok) {
            int64_t q = find_resync(b, n, pos);
            if (q < 0) break;
            pos = (size_t)q;
            e->sync_ok = true;
        }
        // a packet is emittable only when its successor's sync also holds
        size_t run = leading_sync_run(b, n, pos);
        size_t whole = (n - pos) / kPacketLen;
        size_t emit = whole < (run > 0 ? run - 1 : 0) ? whole
                                                      : (run > 0 ? run - 1 : 0);
        for (size_t k = 0; k < emit; k++) {
            if (!route_packet(e, b + pos)) { paused = true; break; }
            pos += kPacketLen;
        }
        if (paused) break;
        if (run >= whole) break;  // clean to buffer end; tail waits for data
        e->sync_ok = false;       // sync broke mid-buffer: byte-wise resync
    }
    if (paused) {
        e->scan_pos = pos;
        e->paused = true;
        // surface the pause so Python reads the packet and updates modes
        emit_event(e, 3, pid_of(b + pos), b + pos, kPacketLen,
                   e->packet_count, 0);
        return false;
    }
    // drop consumed bytes
    if (pos > 0) e->inbuf.erase(e->inbuf.begin(), e->inbuf.begin() + pos);
    e->scan_pos = 0;
    e->paused = false;
    return true;
}

}  // namespace

extern "C" {

void* tse_create() { return new Engine(); }
void tse_destroy(void* h) { delete (Engine*)h; }

void tse_reset(void* h) {
    Engine* e = (Engine*)h;
    e->inbuf.clear();
    e->sync_ok = false;
    e->packet_count = 0;
    e->scramble_count = 0;
    e->cc_error_count = 0;
    e->selected_total = 0;
    e->selected_scramble = 0;
    e->scan_pos = 0;
    e->paused = false;
    for (int i = 0; i < kNumPids; i++) { e->pes[i].buf.clear(); e->pes[i].cc = 0; }
    e->events.clear();
    e->edata.clear();
}

void tse_clear_pes(void* h) {
    Engine* e = (Engine*)h;
    for (int i = 0; i < kNumPids; i++) { e->pes[i].buf.clear(); e->pes[i].cc = 0; }
}

void tse_set_pid_mode(void* h, int pid, int mode) {
    if (pid >= 0 && pid < kNumPids) ((Engine*)h)->pid_mode[pid] = (uint8_t)mode;
}

void tse_clear_pid_modes(void* h) {
    memset(((Engine*)h)->pid_mode, 0, kNumPids);
}

void tse_set_pcr_pid(void* h, int pid) { ((Engine*)h)->pcr_pid = pid; }

// feed bytes (len may be 0 to resume after a pause); returns 1 = fully
// scanned, 0 = paused at a control packet (read events, update modes,
// consume the packet with tse_skip_packet() or leave modes and re-resume)
int tse_input(void* h, const uint8_t* data, long long len) {
    Engine* e = (Engine*)h;
    if (len > 0) e->inbuf.insert(e->inbuf.end(), data, data + len);
    return scan(e) ? 1 : 0;
}

// consume the paused-at packet, counting it. The Python side has fully
// handled it (including its PCR if it carries one), so no events fire here.
void tse_skip_packet(void* h) {
    Engine* e = (Engine*)h;
    if (!e->paused) return;
    const uint8_t* p = e->inbuf.data() + e->scan_pos;
    e->packet_count++;
    if (((p[3] >> 6) & 3) != 0) e->scramble_count++;
    e->scan_pos += kPacketLen;
    e->paused = false;
}

// consume the paused-at packet by ROUTING it under the (re-programmed) pid
// modes — used when a pause packet became a stream packet (video-PID swap).
// If its pid is still pause-mode the engine stays paused.
void tse_resume_packet(void* h) {
    Engine* e = (Engine*)h;
    if (!e->paused) return;
    const uint8_t* p = e->inbuf.data() + e->scan_pos;
    e->paused = false;
    if (route_packet(e, p)) e->scan_pos += kPacketLen;
    else e->paused = true;
}

// overwrite one pid's PES assembly state (switchover from the Python path)
void tse_seed_pes(void* h, int pid, int cc, const uint8_t* data,
                  long long len) {
    Engine* e = (Engine*)h;
    if (pid < 0 || pid >= kNumPids) return;
    PesState& st = e->pes[pid];
    st.cc = (uint8_t)(cc & 0x0F);
    st.buf.assign(data, data + len);
}

void tse_set_sync_ok(void* h, int ok) { ((Engine*)h)->sync_ok = ok != 0; }

// TsPacketParser.flush (packet.py:264-284): emit remaining whole packets
// whose own sync byte holds; then flush PES assembly buffers.
int tse_flush(void* h) {
    Engine* e = (Engine*)h;
    const uint8_t* b = e->inbuf.data();
    size_t n = e->inbuf.size();
    size_t pos = e->scan_pos;
    while (pos + kPacketLen <= n) {
        if (b[pos] == kSync) {
            if (!route_packet(e, b + pos)) {
                // paused: surface and stop (resume via tse_skip_packet +
                // tse_flush again)
                e->scan_pos = pos;
                e->paused = true;
                emit_event(e, 3, pid_of(b + pos), b + pos, kPacketLen,
                           e->packet_count, 0);
                return 0;
            }
            pos += kPacketLen;
        } else {
            pos++;
        }
    }
    e->inbuf.clear();
    e->scan_pos = 0;
    e->paused = false;
    return 1;
}

// flush a single pid's pending unbounded-length PES unit (pes.py flush())
void tse_flush_pes(void* h, int pid) {
    Engine* e = (Engine*)h;
    if (pid < 0 || pid >= kNumPids) return;
    PesState& st = e->pes[pid];
    if (!st.buf.empty()) {
        pes_check_and_out(e, pid, st.buf.data(), st.buf.size(),
                          e->packet_count);
        st.buf.clear();
    }
}

long long tse_event_count(void* h) {
    return (long long)((Engine*)h)->events.size();
}
const long long* tse_events_meta(void* h) {
    return (const long long*)((Engine*)h)->events.data();
}
const uint8_t* tse_events_data(void* h) {
    return ((Engine*)h)->edata.data();
}
void tse_events_clear(void* h) {
    ((Engine*)h)->events.clear();
    ((Engine*)h)->edata.clear();
}

long long tse_counter(void* h, int which) {
    Engine* e = (Engine*)h;
    switch (which) {
        case 0: return e->packet_count;
        case 1: return e->scramble_count;
        case 2: return e->cc_error_count;
        case 3: return e->selected_total;
        case 4: return e->selected_scramble;
    }
    return -1;
}

void tse_set_packet_count(void* h, long long v) {
    ((Engine*)h)->packet_count = v;
}

}  // extern "C"
