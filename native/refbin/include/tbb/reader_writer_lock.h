#pragma once
namespace tbb {
class reader_writer_lock {
  public:
    void lock() {}
    void unlock() {}
    void lock_read() {}
    class scoped_lock {
      public:
        explicit scoped_lock(reader_writer_lock&) {}
    };
    class scoped_lock_read {
      public:
        explicit scoped_lock_read(reader_writer_lock&) {}
    };
};
}
