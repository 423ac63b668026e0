// Minimal cxxopts shim: just enough of the jarro2783/cxxopts API for the
// reference's performance_test.cpp (add_options()(..), parse, count,
// operator[].as<T>(), default_value, help). Long options only, in the
// forms --key value and --key=value.
#pragma once
#include <cstddef>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace cxxopts {

class Value {
  public:
    std::string default_value_;
    bool has_default_ = false;
    std::shared_ptr<Value> default_value(const std::string& v) {
        auto copy = std::make_shared<Value>(*this);
        copy->default_value_ = v;
        copy->has_default_ = true;
        return copy;
    }
};

template <class T>
std::shared_ptr<Value> value() {
    return std::make_shared<Value>();
}

namespace detail {
template <class T>
T convert(const std::string& s);
template <>
inline int convert<int>(const std::string& s) { return std::stoi(s); }
template <>
inline std::size_t convert<std::size_t>(const std::string& s) {
    return static_cast<std::size_t>(std::stoull(s));
}
template <>
inline std::string convert<std::string>(const std::string& s) { return s; }
template <>
inline bool convert<bool>(const std::string& s) {
    return s == "true" || s == "1" || s == "yes" || s.empty();
}
}  // namespace detail

class OptionValue {
  public:
    std::string raw;
    bool present = false;
    template <class T>
    T as() const {
        if (!present) throw std::domain_error("option not present");
        return detail::convert<T>(raw);
    }
};

class ParseResult {
  public:
    std::map<std::string, OptionValue> values;
    std::size_t count(const std::string& key) const {
        auto it = values.find(key);
        return (it != values.end() && it->second.present) ? 1 : 0;
    }
    const OptionValue& operator[](const std::string& key) const {
        static OptionValue missing;
        auto it = values.find(key);
        return it == values.end() ? missing : it->second;
    }
};

class Options;

class OptionAdder {
  public:
    explicit OptionAdder(Options& opts) : opts_(opts) {}
    OptionAdder& operator()(const std::string& names, const std::string& desc,
                            std::shared_ptr<Value> val = nullptr);

  private:
    Options& opts_;
};

class Options {
  public:
    Options(std::string program, std::string description)
        : program_(std::move(program)), description_(std::move(description)) {}

    OptionAdder add_options() { return OptionAdder(*this); }

    ParseResult parse(int argc, char* argv[]) {
        ParseResult result;
        for (const auto& [name, val] : defaults_) {
            if (val && val->has_default_) {
                result.values[name].raw = val->default_value_;
                result.values[name].present = true;
            }
        }
        for (int i = 1; i < argc; ++i) {
            std::string arg = argv[i];
            if (arg.rfind("--", 0) != 0) {
                throw std::invalid_argument("unexpected positional: " + arg);
            }
            arg = arg.substr(2);
            std::string key = arg, val;
            auto eq = arg.find('=');
            if (eq != std::string::npos) {
                key = arg.substr(0, eq);
                val = arg.substr(eq + 1);
            } else if (key == "help" || key == "h") {
                val = "true";
            } else if (i + 1 < argc) {
                val = argv[++i];
            }
            result.values[key].raw = val;
            result.values[key].present = true;
        }
        return result;
    }

    std::string help() const {
        std::ostringstream os;
        os << program_ << " — " << description_ << "\n";
        for (const auto& h : help_lines_) os << "  --" << h << "\n";
        return os.str();
    }

    std::map<std::string, std::shared_ptr<Value>> defaults_;
    std::vector<std::string> help_lines_;

  private:
    std::string program_;
    std::string description_;
};

inline OptionAdder& OptionAdder::operator()(const std::string& names,
                                            const std::string& desc,
                                            std::shared_ptr<Value> val) {
    // "h,help" → last comma-separated token is the long name
    auto comma = names.rfind(',');
    std::string name =
        comma == std::string::npos ? names : names.substr(comma + 1);
    opts_.defaults_[name] = val;
    opts_.help_lines_.push_back(name + "  " + desc);
    return *this;
}

}  // namespace cxxopts
