// Profiling driver: decode an elementary stream N times through the
// in-build decoder, for gprof/callgrind analysis of the hot loops.
// Build (example):
//   g++ -O2 -g -pg -march=native -std=c++17 -pthread \
//       -fno-tree-loop-distribute-patterns -DPROF_H265 \
//       prof_main.cpp h265dec.cpp -o /tmp/prof_h265
// Usage: prof_h265 <es-file> [reps]
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void* H265_Create();
void H265_Destroy(void*);
int H265_Decode(void*, const uint8_t*, long long);
int H265_Flush(void*);
int H265_NextInfo(void*, int*);
int H265_PopFrame(void*, uint8_t*, uint8_t*, uint8_t*);

void* H264_Create();
void H264_Destroy(void*);
int H264_Decode(void*, const uint8_t*, long long);
int H264_Flush(void*);
int H264_NextInfo(void*, int*);
int H264_PopFrame(void*, uint8_t*, uint8_t*, uint8_t*);

void* M2V_Create();
void M2V_Destroy(void*);
int M2V_DecodePicture(void*, const uint8_t*, long long);
int M2V_Flush(void*);
int M2V_NextInfo(void*, int*);
int M2V_PopFrame(void*, uint8_t*, uint8_t*, uint8_t*);
}

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: %s es [reps]\n", argv[0]); return 2; }
  FILE* f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 2; }
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> es(sz);
  if (fread(es.data(), 1, sz, f) != (size_t)sz) return 2;
  fclose(f);
  int reps = argc > 2 ? atoi(argv[2]) : 1;
  int total = 0;
  std::vector<uint8_t> y, u, v;
#ifdef PROF_M2V
  // M2V_DecodePicture consumes one coded picture per call: pre-split the ES
  // at picture start codes (00 00 01 00), keeping leading sequence headers
  // attached to the first chunk.
  std::vector<std::pair<long, long>> chunks;
  {
    std::vector<long> starts;
    for (long i = 0; i + 4 <= sz; i++)
      if (es[i] == 0 && es[i + 1] == 0 && es[i + 2] == 1 && es[i + 3] == 0)
        starts.push_back(i);
    for (size_t k = 0; k < starts.size(); k++)
      chunks.push_back({k == 0 ? 0 : starts[k],
                        k + 1 < starts.size() ? starts[k + 1] : sz});
  }
#endif
  for (int r = 0; r < reps; r++) {
#ifdef PROF_M2V
    void* h = M2V_Create();
    int info[12];
    auto drain = [&](void* hh2) {
      while (M2V_NextInfo(hh2, info) > 0) {
        int w = info[0], ht = info[1];
        y.resize((size_t)w * ht);
        u.resize((size_t)((w + 1) / 2) * ((ht + 1) / 2) + 64);
        v.resize(u.size());
        M2V_PopFrame(hh2, y.data(), u.data(), v.data());
        total++;
      }
    };
    for (auto& c : chunks) {
      M2V_DecodePicture(h, es.data() + c.first, c.second - c.first);
      drain(h);
    }
    M2V_Flush(h);
    drain(h);
    M2V_Destroy(h);
#elif defined(PROF_H264)
    void* h = H264_Create();
    H264_Decode(h, es.data(), (long long)es.size());
    H264_Flush(h);
    int info[8];
    while (H264_NextInfo(h, info) > 0) {
      int w = info[0], hh = info[1];
      int bpp = 1;  // H.264 engine is 8-bit
      y.resize((size_t)w * hh * bpp);
      u.resize((size_t)w * hh * bpp / 4 + 64);
      v.resize((size_t)w * hh * bpp / 4 + 64);
      H264_PopFrame(h, y.data(), u.data(), v.data());
      total++;
    }
    H264_Destroy(h);
#else
    void* h = H265_Create();
    H265_Decode(h, es.data(), (long long)es.size());
    H265_Flush(h);
    int info[8];
    while (H265_NextInfo(h, info) > 0) {
      int w = info[0], hh = info[1];
      int bpp = info[4] > 8 ? 2 : 1;
      y.resize((size_t)w * hh * bpp);
      u.resize((size_t)w * hh * bpp / 4 + 64);
      v.resize((size_t)w * hh * bpp / 4 + 64);
      H265_PopFrame(h, y.data(), u.data(), v.data());
      total++;
    }
    H265_Destroy(h);
#endif
  }
  printf("decoded %d frames\n", total);
  return total > 0 ? 0 : 1;
}
