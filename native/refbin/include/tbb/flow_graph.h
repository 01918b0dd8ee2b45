// Single-threaded stand-in for the TBB flow-graph subset the reference
// uses (old-TBB API: source_node, function_node, multifunction_node,
// join_node (queueing), broadcast_node, buffer_node, split_node).
//
// Execution model: one global FIFO task queue per graph.  try_put
// enqueues a delivery task; graph::wait_for_all() first exhausts every
// source (in construction order) and then drains the queue.  With no
// concurrency, the whole pipeline is deterministic and each read's output
// is emitted in stream order — the reference's own output order is
// TBB-scheduler-dependent, and the serial schedule is the canonical one
// for golden comparisons.  Senders buffer messages arriving before any
// successor is connected (the reference pre-loads tokens into a
// buffer_node before wiring it) and flush on the first make_edge.
#pragma once

#include <atomic>
#include <cstddef>
#include <deque>
#include <functional>
#include <tuple>
#include <vector>

namespace tbb {
namespace flow {

using std::tuple;
using std::get;

constexpr int unlimited = 0;

class graph {
  public:
    std::deque<std::function<void()>> tasks;
    std::vector<std::function<void()>> sources;

    void run_all() {
        while (!tasks.empty()) {
            auto f = std::move(tasks.front());
            tasks.pop_front();
            f();
        }
    }
    void wait_for_all() {
        for (auto &s : sources) s();
        run_all();
        sources.clear();
    }
};

template <typename T> class receiver {
  public:
    virtual ~receiver() = default;
    virtual bool try_put(const T &t) = 0;
};

template <typename T> class sender_port {
  public:
    graph *g_ = nullptr;
    std::vector<receiver<T> *> succ_;
    std::deque<T> pending_;

    void add_successor(receiver<T> *r) {
        succ_.push_back(r);
        if (succ_.size() == 1) {
            while (!pending_.empty()) {
                T v = pending_.front();
                pending_.pop_front();
                do_push(v);
            }
        }
    }
    void do_push(const T &v) {
        if (succ_.empty()) {
            pending_.push_back(v);
            return;
        }
        for (auto *r : succ_) {
            T copy = v;
            g_->tasks.push_back([r, copy]() { r->try_put(copy); });
        }
    }
    // ports of multifunction/split nodes receive via try_put in the body
    bool try_put(const T &v) {
        do_push(v);
        return true;
    }
};

template <typename S, typename R> void make_edge(S &s, R &r) {
    s.add_successor(&r);
}

template <typename O> class source_node : public sender_port<O> {
  public:
    template <typename Body>
    source_node(graph &g, Body body, bool /*active*/ = true) {
        this->g_ = &g;
        g.sources.push_back([this, body]() mutable {
            O v;
            while (body(v)) {
                this->do_push(v);
                v = O();
            }
        });
    }
};

template <typename I, typename O>
class function_node : public sender_port<O>, public receiver<I> {
    std::function<O(I)> body_;

  public:
    template <typename Body>
    function_node(graph &g, int /*concurrency*/, Body body) : body_(body) {
        this->g_ = &g;
    }
    bool try_put(const I &v) override {
        this->do_push(body_(v));
        return true;
    }
};

template <typename T>
class broadcast_node : public sender_port<T>, public receiver<T> {
  public:
    explicit broadcast_node(graph &g) { this->g_ = &g; }
    bool try_put(const T &v) override {
        this->do_push(v);
        return true;
    }
};

template <typename T>
class buffer_node : public sender_port<T>, public receiver<T> {
  public:
    explicit buffer_node(graph &g) { this->g_ = &g; }
    bool try_put(const T &v) override {
        this->do_push(v);
        return true;
    }
};

// queueing join (the default policy): per-port FIFOs, emit when full
template <typename TupleT> class join_node;

template <typename A, typename B>
class join_node<std::tuple<A, B>> : public sender_port<std::tuple<A, B>> {
  public:
    struct port0_t : receiver<A> {
        join_node *jn;
        bool try_put(const A &a) override {
            jn->qa_.push_back(a);
            jn->try_emit();
            return true;
        }
    } p0_;
    struct port1_t : receiver<B> {
        join_node *jn;
        bool try_put(const B &b) override {
            jn->qb_.push_back(b);
            jn->try_emit();
            return true;
        }
    } p1_;
    std::deque<A> qa_;
    std::deque<B> qb_;

    explicit join_node(graph &g) {
        this->g_ = &g;
        p0_.jn = this;
        p1_.jn = this;
    }
    void try_emit() {
        while (!qa_.empty() && !qb_.empty()) {
            auto t = std::make_tuple(qa_.front(), qb_.front());
            qa_.pop_front();
            qb_.pop_front();
            this->do_push(t);
        }
    }
    template <std::size_t N> auto &in_port() {
        if constexpr (N == 0)
            return p0_;
        else
            return p1_;
    }
};

// multifunction_node<Input, tuple<P0, P1>>: body(input, output_ports&)
template <typename I, typename Ports> class multifunction_node;

template <typename I, typename P0, typename P1>
class multifunction_node<I, std::tuple<P0, P1>> : public receiver<I> {
  public:
    using output_ports_type = std::tuple<sender_port<P0>, sender_port<P1>>;
    output_ports_type ports_;
    std::function<void(I, output_ports_type &)> body_;

    template <typename Body>
    multifunction_node(graph &g, int /*concurrency*/, Body body)
        : body_(body) {
        std::get<0>(ports_).g_ = &g;
        std::get<1>(ports_).g_ = &g;
    }
    bool try_put(const I &v) override {
        body_(v, ports_);
        return true;
    }
    template <std::size_t N> auto &out_port() { return std::get<N>(ports_); }
};

// split_node over a 2-tuple (the reference instantiates it with a spurious
// extra template argument that old TBB tolerated)
template <typename TupleT, typename... Extra> class split_node;

template <typename A, typename B, typename... Extra>
class split_node<std::tuple<A, B>, Extra...>
    : public receiver<std::tuple<A, B>> {
  public:
    std::tuple<sender_port<A>, sender_port<B>> ports_;
    explicit split_node(graph &g) {
        std::get<0>(ports_).g_ = &g;
        std::get<1>(ports_).g_ = &g;
    }
    bool try_put(const std::tuple<A, B> &v) override {
        std::get<0>(ports_).do_push(std::get<0>(v));
        std::get<1>(ports_).do_push(std::get<1>(v));
        return true;
    }
    template <std::size_t N> auto &out_port() { return std::get<N>(ports_); }
};

template <std::size_t N, typename Node> auto &input_port(Node &n) {
    return n.template in_port<N>();
}
template <std::size_t N, typename Node> auto &output_port(Node &n) {
    return n.template out_port<N>();
}

}  // namespace flow
}  // namespace tbb
