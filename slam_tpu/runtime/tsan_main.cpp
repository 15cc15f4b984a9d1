// Standalone ThreadSanitizer driver for the native runtime's threaded
// parts (the prefetcher worker + inner decode pool, native.cpp:132-238).
//
// SURVEY.md §5 race-detection row: the reference is single-threaded with
// nothing to sanitize, but this runtime ADDS threads, so it gets a TSAN
// gate: scripts/tsan_native.py builds this file with -fsanitize=thread
// and fails on any data-race report. Exercises: full stream consumption,
// repeated create/destroy, mid-stream destroy (stop/cv wakeups), and
// concurrent consumers calling loader_next from two threads.

#include "native.cpp"

#include <cstdio>
#include <cstdlib>
#include <string>
#include <thread>
#include <vector>

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s <png_dir> <F> <H> <W>\n", argv[0]);
    return 2;
  }
  const char* dir = argv[1];
  int F = atoi(argv[2]), H = atoi(argv[3]), W = atoi(argv[4]);
  const int chunk = 4;

  std::vector<std::string> ls, rs;
  for (int i = 0; i < F; ++i) {
    char b[512];
    snprintf(b, sizeof b, "%s/l%03d.png", dir, i);
    ls.push_back(b);
    snprintf(b, sizeof b, "%s/r%03d.png", dir, i);
    rs.push_back(b);
  }
  std::vector<const char*> lp, rp;
  for (auto& s : ls) lp.push_back(s.c_str());
  for (auto& s : rs) rp.push_back(s.c_str());

  size_t plane = (size_t)chunk * H * W;

  // 1. repeated full streams
  for (int round = 0; round < 3; ++round) {
    void* h = loader_create(lp.data(), rp.data(), F, H, W, chunk, 3);
    std::vector<float> L(plane), R(plane);
    int total = 0, n;
    while ((n = loader_next(h, L.data(), R.data())) > 0) total += n;
    loader_destroy(h);
    printf("round %d streamed %d frames (padded chunks)\n", round, total);
  }

  // 2. mid-stream destroy: stop flag + cv wakeups race surface
  {
    void* h = loader_create(lp.data(), rp.data(), F, H, W, chunk, 3);
    std::vector<float> L(plane), R(plane);
    loader_next(h, L.data(), R.data());
    loader_destroy(h);
    printf("mid-stream destroy ok\n");
  }

  // 3. two consumer threads draining one loader concurrently
  {
    void* h = loader_create(lp.data(), rp.data(), F, H, W, chunk, 3);
    auto drain = [&] {
      std::vector<float> L(plane), R(plane);
      while (loader_next(h, L.data(), R.data()) > 0) {
      }
    };
    std::thread a(drain), b(drain);
    a.join();
    b.join();
    loader_destroy(h);
    printf("concurrent consumers ok\n");
  }
  return 0;
}
