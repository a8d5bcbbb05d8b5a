// Native bag IO: parallel pread of float32 feature-bag payloads directly
// into a preallocated padded batch buffer.
//
// This is the framework's replacement for the reference's DataLoader worker
// processes (utils/utils.py:37-61): instead of torch.load -> tensor ->
// collate copies per slide in Python, the batcher resolves each bag file's
// raw payload (offset, rows) once, and this library fills the [B, bucket, D]
// batch with one pread per bag, multithreaded, GIL-free, with no
// intermediate allocations. Works for any format whose payload is contiguous
// little-endian float32 on disk: .npy, torch-zip .pt members (stored,
// uncompressed), and contiguous h5 datasets.
//
// Build: g++ -O3 -shared -fPIC -pthread -std=c++17 bagio.cpp -o _bagio.so
// Binding: ctypes (toad_tpu/native/__init__.py).

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

// Read exactly `count` bytes at `offset` into `buf`; returns 0 on success.
int pread_full(int fd, void* buf, size_t count, int64_t offset) {
    char* p = static_cast<char*>(buf);
    while (count > 0) {
        ssize_t got = ::pread(fd, p, count, offset);
        if (got < 0) {
            if (errno == EINTR) continue;
            return errno ? errno : EIO;
        }
        if (got == 0) return EIO;  // unexpected EOF
        p += got;
        offset += got;
        count -= static_cast<size_t>(got);
    }
    return 0;
}

}  // namespace

extern "C" {

// Fill a padded batch from raw bag payloads.
//   paths[j]   : file containing bag j
//   offsets[j] : byte offset of bag j's float32 payload within the file
//   nrows[j]   : rows to read for bag j (already clipped to <= bucket)
//   dim        : feature dimension D
//   bucket     : padded row count per bag
//   out        : [nbags, bucket, dim] float32, caller-zeroed
//   mask       : [nbags, bucket]      float32, caller-zeroed
//   nthreads   : worker threads (<=0 -> hardware_concurrency)
// Returns 0 on success, or (j+1) for the first bag whose read failed.
int64_t toad_pack_bags(const char** paths, const int64_t* offsets,
                       const int64_t* nrows, int64_t dim, int64_t bucket,
                       float* out, float* mask, int64_t nbags,
                       int32_t nthreads) {
    if (nthreads <= 0) {
        nthreads = static_cast<int32_t>(std::thread::hardware_concurrency());
        if (nthreads <= 0) nthreads = 4;
    }
    if (nthreads > nbags) nthreads = static_cast<int32_t>(nbags > 0 ? nbags : 1);

    std::atomic<int64_t> next(0);
    std::atomic<int64_t> failed(0);  // 0 = ok, else j+1

    auto worker = [&]() {
        for (;;) {
            int64_t j = next.fetch_add(1, std::memory_order_relaxed);
            if (j >= nbags || failed.load(std::memory_order_relaxed)) return;
            int fd = ::open(paths[j], O_RDONLY);
            if (fd < 0) {
                int64_t expect = 0;
                failed.compare_exchange_strong(expect, j + 1);
                return;
            }
#ifdef POSIX_FADV_SEQUENTIAL
            ::posix_fadvise(fd, offsets[j], nrows[j] * dim * sizeof(float),
                            POSIX_FADV_SEQUENTIAL);
#endif
            float* dst = out + j * bucket * dim;
            int err = pread_full(fd, dst,
                                 static_cast<size_t>(nrows[j]) * dim * sizeof(float),
                                 offsets[j]);
            ::close(fd);
            if (err != 0) {
                int64_t expect = 0;
                failed.compare_exchange_strong(expect, j + 1);
                return;
            }
            float* m = mask + j * bucket;
            for (int64_t r = 0; r < nrows[j]; ++r) m[r] = 1.0f;
        }
    };

    if (nthreads <= 1) {
        worker();
    } else {
        std::vector<std::thread> threads;
        threads.reserve(nthreads);
        for (int32_t t = 0; t < nthreads; ++t) threads.emplace_back(worker);
        for (auto& t : threads) t.join();
    }
    return failed.load();
}

// Version/ABI probe for the ctypes loader.
int32_t toad_bagio_abi_version() { return 1; }

}  // extern "C"
